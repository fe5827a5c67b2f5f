# IpxTpu.jl — Julia binding for the ipx_tpu solver.
#
# Counterpart of the reference Julia binding (reference: Julia/ipx.jl), built
# over PyCall instead of ccall since the solver's stable API surface is the
# Python package (ipx_tpu.capi mirrors the reference C API).
#
# Usage:
#   using PyCall
#   include("IpxTpu.jl"); using .IpxTpu
#   model = IpxTpu.Model(obj, lb, ub, Ap, Ai, Ax, rhs, constr_type)
#   basic, interior, info = IpxTpu.solve(model)

module IpxTpu

using PyCall
using SparseArrays

const capi = PyNULL()

function __init__()
    copy!(capi, pyimport("ipx_tpu.capi"))
end

struct Model
    obj::Vector{Float64}
    lb::Vector{Float64}
    ub::Vector{Float64}
    A::SparseMatrixCSC{Float64,Int}
    rhs::Vector{Float64}
    constr_type::String
end

"""
    solve(model; kwargs...)

Solves the LP. Keyword arguments set solver parameters by name (same names
and defaults as the reference, e.g. `crossover=0`, `ipm_maxiter=500`).
Returns `(status, info, interior, basic)` where `interior`/`basic` are
`PyObject`s exposing x, xl, xu, slack, y, zl, zu / x, slack, y, z, vbasis,
cbasis as arrays.
"""
function solve(model::Model; resume_from::AbstractString="",
               checkpoint_to::AbstractString="", kwargs...)
    h = capi.ipx_new()
    try
        p = capi.ipx_get_parameters(h)
        for (k, v) in kwargs
            setproperty!(p, Symbol(k), v)
        end
        capi.ipx_set_parameters(h, p)

        n = length(model.obj)
        m = length(model.rhs)
        # 0-based CSC
        Ap = model.A.colptr .- 1
        Ai = model.A.rowval .- 1
        Ax = model.A.nzval
        errflag = capi.ipx_load_model(h, n, model.obj, model.lb, model.ub,
                                      m, Ap, Ai, Ax, model.rhs,
                                      model.constr_type)
        errflag == 0 || error("ipx_load_model failed: $errflag")
        if !isempty(resume_from)
            errflag = capi.ipx_load_checkpoint(h, resume_from)
            errflag == 0 || error("ipx_load_checkpoint failed: $errflag")
        end
        status = capi.ipx_solve(h)
        if !isempty(checkpoint_to)
            capi.ipx_save_checkpoint(h, checkpoint_to)
        end
        info = capi.ipx_get_info(h)
        interior = capi.ipx_get_interior_solution(h)
        basic = capi.ipx_get_basic_solution(h)
        return status, info, interior, basic
    finally
        capi.ipx_free(h)
    end
end

end # module

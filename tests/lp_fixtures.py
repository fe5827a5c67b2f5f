"""LP test fixtures.

LPBuilder is a column-wise LP builder mirroring the reference unit-test fixture
(reference: check/test_model.h:11-45): start with constraints, add columns
with their nonzeros and bounds. Also contains the Netlib afiro instance
(public LP data, in-repo at reference: example/afiro.cc:12-46) and synthetic
LP generators for benchmarks.
"""
from __future__ import annotations

import numpy as np

INF = np.inf


class LPBuilder:
    """Column-wise LP builder."""

    def __init__(self, rhs, constr_type):
        self.rhs = np.asarray(rhs, dtype=float)
        self.constr_type = list(constr_type)
        self.obj = []
        self.lb = []
        self.ub = []
        self.cols = []      # list of (indices, values)

    def add_column(self, obj, indices, values, lb, ub):
        self.obj.append(obj)
        self.lb.append(lb)
        self.ub.append(ub)
        self.cols.append((list(indices), list(values)))
        return self

    def arrays(self):
        num_var = len(self.cols)
        Ap = [0]
        Ai, Ax = [], []
        for idx, val in self.cols:
            Ai.extend(idx)
            Ax.extend(val)
            Ap.append(len(Ai))
        return dict(
            num_var=num_var,
            obj=np.array(self.obj, dtype=float),
            lb=np.array(self.lb, dtype=float),
            ub=np.array(self.ub, dtype=float),
            num_constr=len(self.rhs),
            Ap=np.array(Ap, dtype=np.int64),
            Ai=np.array(Ai, dtype=np.int64),
            Ax=np.array(Ax, dtype=float),
            rhs=self.rhs,
            constr_type="".join(self.constr_type),
        )

    def load_into(self, solver):
        a = self.arrays()
        return solver.load_model(a["num_var"], a["obj"], a["lb"], a["ub"],
                                 a["num_constr"], a["Ap"], a["Ai"], a["Ax"],
                                 a["rhs"], a["constr_type"])


def afiro():
    """Netlib afiro: 9 constraints, 12 variables, optimum -464.75314."""
    lp = LPBuilder(
        rhs=[0.0, 80.0, 0.0, 0.0, 0.0, 0.0, 0.0, 44.0, 300.0],
        constr_type="<<=<<=<<<")
    ub = [80.0, 283.303, 283.303, 312.813, 349.187, INF, INF, INF,
          57.201, 500.0, 500.501, 357.501]
    obj = [-0.2194, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -0.32,
           -0.5564, 0.6, -0.48]
    cols = [
        ([0, 5], [-1.0, 0.301]),
        ([1, 6, 7, 8], [1.0, -1.0, 0.301, 1.06]),
        ([2, 6, 7, 8], [1.0, -1.0, 0.313, 1.06]),
        ([3, 6, 7, 8], [1.0, -1.0, 0.313, 0.96]),
        ([4, 6, 7, 8], [1.0, -1.0, 0.326, 0.86]),
        ([1, 2], [-1.0, 0.99078]),
        ([2, 3], [1.00922, -1.0]),
        ([2, 4], [1.01802, -1.0]),
        ([0, 6], [1.4, 1.0]),
        ([0, 5], [0.109, -1.0]),
        ([2, 5], [-0.419111, 1.0]),
        ([5, 7], [1.4, -1.0]),
    ]
    for j in range(12):
        lp.add_column(obj[j], cols[j][0], cols[j][1], 0.0, ub[j])
    return lp


AFIRO_OBJECTIVE = -464.75314286

def random_lp(m, n, density=0.01, seed=0, ensure_feasible=True):
    """Random sparse LP with a known feasible interior point, netlib-like
    structure: min c'x st Ax <= b, 0 <= x <= u."""
    rng = np.random.default_rng(seed)
    nnz_per_col = max(2, int(density * m))
    cols = []
    Ai, Ax, Ap = [], [], [0]
    for j in range(n):
        k = rng.integers(1, 2 * nnz_per_col)
        idx = np.sort(rng.choice(m, size=min(k, m), replace=False))
        val = rng.standard_normal(idx.size)
        Ai.extend(idx.tolist())
        Ax.extend(val.tolist())
        Ap.append(len(Ai))
    import scipy.sparse as sp
    A = sp.csc_matrix((Ax, Ai, Ap), shape=(m, n))
    x0 = rng.uniform(0.5, 1.5, size=n)
    b = A @ x0 + rng.uniform(0.1, 1.0, size=m)   # strictly feasible slack
    c = rng.standard_normal(n)
    ub = np.full(n, 10.0)
    lb = np.zeros(n)
    return dict(num_var=n, obj=c, lb=lb, ub=ub, num_constr=m,
                Ap=np.array(Ap, dtype=np.int64),
                Ai=np.array(Ai, dtype=np.int64),
                Ax=np.array(Ax, dtype=float), rhs=b,
                constr_type="<" * m)

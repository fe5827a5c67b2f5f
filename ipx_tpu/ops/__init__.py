"""Device (JAX/XLA/Pallas) compute kernels for the solver hot paths."""

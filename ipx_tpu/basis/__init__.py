"""Basis / simplex linear algebra layer: sparse LU (native kernel),
basis manager, starting-basis construction, maxvolume, crossover."""

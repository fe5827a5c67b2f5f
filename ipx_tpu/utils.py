"""Small dense helpers (reference: src/utils.{h,cc})."""
from __future__ import annotations

import numpy as np


def onenorm(x: np.ndarray) -> float:
    return float(np.sum(np.abs(x))) if x.size else 0.0


def infnorm(x: np.ndarray) -> float:
    return float(np.max(np.abs(x))) if x.size else 0.0


def sortperm(values: np.ndarray, reverse: bool = False) -> np.ndarray:
    """Stable argsort (reference: src/utils.h Sortperm); used for crossover
    push order and crash-basis weight order."""
    v = np.asarray(values)
    if reverse:
        # stable decreasing order: negate sort keys of the stable increasing
        # argsort of the reversed array trick; simplest correct stable form:
        idx = np.argsort(-v, kind="stable")
        return idx
    return np.argsort(v, kind="stable")

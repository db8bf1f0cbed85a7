"""Dense vector helpers (reference: ``src/vector.c``).

The reference fills x with unseeded ``rand()/RAND_MAX`` — deterministic
across runs because the seed is never set (vector.c:36-41), which makes
CSV rows comparable across iterations. We reproduce that property with
an explicit default seed.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SEED = 42


def make_x(n: int, cols: int | None = None, seed: int = DEFAULT_SEED,
           dtype=np.float64) -> np.ndarray:
    """Uniform [0,1) vector (or (n, cols) matrix for SpMM), fixed seed
    (vec_fill_random analog, vector.c:36-41)."""
    rng = np.random.default_rng(seed)
    shape = (n,) if cols is None else (n, cols)
    return rng.random(shape, dtype=np.float64).astype(dtype)

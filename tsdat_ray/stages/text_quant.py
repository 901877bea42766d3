"""Shared quantized-float-contract helper: DuckDB ROUND semantics."""
import numpy as np


def half_away(y: np.ndarray) -> np.ndarray:
    """round() with DuckDB semantics: halves away from zero (np.round is
    banker's; arbitrary doubles DO tie at .5)."""
    return np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)

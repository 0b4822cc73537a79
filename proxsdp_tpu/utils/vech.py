"""Packed symmetric-triangle (svec) index utilities.

The packing order matches the reference / MOI convention: column-major upper
triangle, i.e. (0,0), (0,1), (1,1), (0,2), (1,2), (2,2), ...
(reference: src/prox_operators.jl:1-31, src/util.jl:18-38).

All functions here are host-side (NumPy); the JAX gather maps built from them
live in proxsdp_tpu/ops/tri.py.
"""

from __future__ import annotations

import math

import numpy as np


def sympackedlen(n: int) -> int:
    """Triangle length for an n x n symmetric matrix (MOI sympackedlen)."""
    return n * (n + 1) // 2


def sympackeddim(tri_len: int) -> int:
    """Inverse of sympackedlen; errors if tri_len is not triangular."""
    n = int(round((math.isqrt(8 * tri_len + 1) - 1) / 2))
    if sympackedlen(n) != tri_len:
        raise ValueError(f"{tri_len} is not a triangular number")
    return n


def tri_ij(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(i, j) row/col indices (i <= j) for each packed triangle position."""
    j = np.repeat(np.arange(n), np.arange(1, n + 1))
    i = np.concatenate([np.arange(k + 1) for k in range(n)]) if n else np.zeros(0, np.int64)
    return i.astype(np.int64), j.astype(np.int64)


def tri_pos(i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Packed position of entry (i, j) with i <= j: j*(j+1)/2 + i."""
    return (j * (j + 1)) // 2 + i


def square_gather_index(n: int) -> np.ndarray:
    """For each square entry (row-major flat), the packed triangle index."""
    I, J = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    lo, hi = np.minimum(I, J), np.maximum(I, J)
    return tri_pos(lo, hi).reshape(-1).astype(np.int64)


def offdiag_mask_tri(n: int) -> np.ndarray:
    """Boolean mask over packed positions: True where i != j (off-diagonal)."""
    i, j = tri_ij(n)
    return i != j


def ivech(v: np.ndarray) -> np.ndarray:
    """Packed upper triangle -> upper-triangular matrix (zeros below)."""
    n = sympackeddim(len(v))
    out = np.zeros((n, n), dtype=v.dtype)
    i, j = tri_ij(n)
    out[i, j] = v
    return out


def ivec(v: np.ndarray) -> np.ndarray:
    """Packed upper triangle -> full symmetric matrix."""
    out = ivech(v)
    return out + out.T - np.diag(np.diag(out))


def vech(X: np.ndarray) -> np.ndarray:
    """Full symmetric matrix -> packed upper triangle (no scaling)."""
    n = X.shape[0]
    i, j = tri_ij(n)
    return np.asarray(X)[i, j]

"""Oracle tests for triangle<->square maps (vs reference
src/prox_operators.jl:1-31 semantics)."""

import numpy as np
import pytest

from proxsdp_tpu.ops.tri import square_to_tri, tri_to_square
from proxsdp_tpu.utils.vech import (
    ivec,
    ivech,
    offdiag_mask_tri,
    sympackeddim,
    sympackedlen,
    tri_ij,
    vech,
)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_roundtrip(n, rng):
    v = rng.randn(sympackedlen(n))
    X = tri_to_square(v, n)
    X = np.asarray(X)
    assert np.allclose(X, X.T)
    v2 = np.asarray(square_to_tri(X, n))
    assert np.allclose(v, v2, atol=1e-12)


def test_scaling_convention(rng):
    """Packed off-diagonals carry sqrt(2): tri_to_square divides."""
    n = 3
    v = np.zeros(sympackedlen(n))
    v[1] = np.sqrt(2.0)  # entry (0,1)
    X = np.asarray(tri_to_square(v, n))
    assert np.isclose(X[0, 1], 1.0) and np.isclose(X[1, 0], 1.0)
    v[0] = 5.0  # diagonal entry unscaled
    X = np.asarray(tri_to_square(v, n))
    assert np.isclose(X[0, 0], 5.0)


def test_frobenius_isometry(rng):
    """<x, y>_packed == <X, Y>_Frobenius under the sqrt(2) convention."""
    n = 6
    va, vb = rng.randn(sympackedlen(n)), rng.randn(sympackedlen(n))
    Xa = np.asarray(tri_to_square(va, n))
    Xb = np.asarray(tri_to_square(vb, n))
    assert np.isclose(np.dot(va, vb), np.sum(Xa * Xb), atol=1e-10)


def test_vech_helpers(rng):
    n = 4
    X = rng.randn(n, n)
    X = X + X.T
    v = vech(X)
    assert v.shape == (sympackedlen(n),)
    assert np.allclose(ivec(v), X)
    assert sympackeddim(sympackedlen(n)) == n
    i, j = tri_ij(n)
    assert np.all(i <= j)
    assert offdiag_mask_tri(n).sum() == sympackedlen(n) - n

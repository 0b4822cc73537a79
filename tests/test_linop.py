"""Linear-operator layer oracle tests (reference applies M with sparse
CSC mul!, src/pdhg.jl:140-141; we pick dense/ELL/COO device forms —
every form must agree with the scipy oracle)."""

import numpy as np
import pytest
import scipy.sparse as sp

from proxsdp_tpu.ops.linop import (
    CooOp,
    DenseOp,
    EllOp,
    _build_ell,
    _to_coo,
    build_linop,
    stack_vertical,
)


def random_sparse(rng, m, n, nnz):
    rows = rng.randint(0, m, nnz).astype(np.int64)
    cols = rng.randint(0, n, nnz).astype(np.int64)
    vals = rng.randn(nnz)
    key = rows * n + cols
    _, uidx = np.unique(key, return_index=True)
    return rows[uidx], cols[uidx], vals[uidx]


@pytest.mark.parametrize("force", ["dense", "ell", "coo"])
def test_forms_match_scipy(rng, force):
    import jax.numpy as jnp

    m, n = 37, 53
    rows, cols, vals = random_sparse(rng, m, n, 150)
    M = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    A, G = M[:20], M[20:]
    op = build_linop(A, G, jnp.float64, force=force)
    # device arrays: the solver always feeds jnp operands (CooOp.rmatvec
    # uses the .at[] indexed-update API)
    x = jnp.asarray(rng.randn(n))
    y = jnp.asarray(rng.randn(m))
    assert np.allclose(np.asarray(op.matvec(x)), M @ x, atol=1e-12)
    assert np.allclose(np.asarray(op.rmatvec(y)), M.T @ y, atol=1e-12)
    assert np.isclose(
        float(op.frobenius_norm()), sp.linalg.norm(M), atol=1e-10
    )


def test_ell_builder_large_nnz(rng):
    # the vectorized table fill (the Python-loop version cost seconds at
    # SDPLIB-tail scale); exactness vs scipy at ~100k entries
    m, n = 30_000, 1_500
    rows, cols, vals = random_sparse(rng, m, n, 100_000)
    op = _build_ell(rows, cols, vals, m, n, np.float64, max_width=256)
    assert op is not None
    M = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    x = rng.randn(n)
    y = rng.randn(m)
    assert np.allclose(np.asarray(op.matvec(x)), M @ x, atol=1e-10)
    assert np.allclose(np.asarray(op.rmatvec(y)), M.T @ y, atol=1e-10)


def test_ell_width_gate(rng):
    # a column denser than max_width must reject the ELL form
    rows = np.arange(40, dtype=np.int64)
    cols = np.zeros(40, np.int64)
    vals = np.ones(40)
    assert _build_ell(rows, cols, vals, 40, 3, np.float64, max_width=8) is None


def test_empty_rows_and_cols(rng):
    import jax.numpy as jnp

    m, n = 10, 12
    M = sp.csr_matrix((m, n))
    M[3, 4] = 2.0
    op = build_linop(M[:5], M[5:], jnp.float64, force="ell")
    x = rng.randn(n)
    out = np.asarray(op.matvec(x))
    assert np.allclose(out, np.asarray(M @ x), atol=1e-12)


def test_shard_linop_roundtrip(rng):
    """shard_linop must not change values, only layout (8-dev CPU mesh)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from proxsdp_tpu.ops.linop import shard_linop

    m, n = 24, 64
    rows, cols, vals = random_sparse(rng, m, n, 120)
    M = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    x = rng.randn(n)
    y = rng.randn(m)
    for force in ("dense", "ell"):
        op = build_linop(M[:10], M[10:], jnp.float64, force=force)
        sharded = shard_linop(op, mesh, "tp")
        assert type(sharded) is type(op)
        assert np.allclose(np.asarray(sharded.matvec(x)), M @ x, atol=1e-12)
        assert np.allclose(
            np.asarray(sharded.rmatvec(y)), M.T @ y, atol=1e-12
        )


def test_shard_linop_non_divisible_dims(rng):
    """Dims that do not divide by the mesh size fall back to replicated
    placement instead of failing device_put (SDPLIB sides are rarely
    multiples of the mesh size — mcp250-1 under tp=8, round 5)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from proxsdp_tpu.ops.linop import shard_linop

    m, n = 25, 63  # neither divides the 8-device mesh
    rows, cols, vals = random_sparse(rng, m, n, 110)
    M = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    mesh = Mesh(np.array(jax.devices()), ("tp",))
    x = rng.randn(n)
    y = rng.randn(m)
    for force in ("dense", "ell"):
        op = build_linop(M[:10], M[10:], jnp.float64, force=force)
        sharded = shard_linop(op, mesh, "tp")
        assert np.allclose(np.asarray(sharded.matvec(x)), M @ x, atol=1e-12)
        assert np.allclose(
            np.asarray(sharded.rmatvec(y)), M.T @ y, atol=1e-12
        )

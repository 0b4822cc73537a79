"""Ruiz-style diagonal equilibration (reference: src/equilibration.jl:1-78).

Projected-averaged stochastic-gradient scheme over E*M*D with
exp-parameterized diagonals.  This is one-shot host-side preprocessing
(reference runs it once before the loop, pdhg.jl:64-92), so it is NumPy —
the device never sees unequilibrated data.

Reference quirks reproduced faithfully:
* the column scaling v is collapsed to its mean each iteration
  (equilibration.jl:56-58), making D a positive scalar multiple of I;
* the averaged iterates (u_, v_) produce the final E, D;
* gating: skipped unless min(M)/max(M) > equilibration_limit
  (pdhg.jl:67-73) — i.e. practically only for all-positive matrices —
  unless equilibration_force is set.

Deviation from the reference: we equilibrate the already sqrt(2)-scaled M
(the reference scales in the other order).  Because D is a scalar multiple
of the identity it commutes with the triangle scaling, so only E's value
differs slightly — same fixed point semantics, documented here.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Equilibration(NamedTuple):
    E: np.ndarray  # row scaling (p+m,)
    D: np.ndarray  # column scaling (n,)


def equilibrate_host(setup, opts):
    """Apply E M D preconditioning to a SetupProblem in place.

    Returns Equilibration or None when gated off.
    """
    from .ops.linop import stack_vertical

    M = stack_vertical(setup.A, setup.G)
    sparse = hasattr(M, "toarray")
    Md = M.toarray() if sparse else np.asarray(M, dtype=np.float64)
    pm, n = Md.shape
    if pm == 0 or n == 0:
        return None

    if not opts.equilibration_force:
        UB = Md.max()
        LB = Md.min()
        if UB == 0 or LB / UB <= opts.equilibration_limit:
            return None

    alpha2 = np.sqrt(n / pm)
    beta2 = np.sqrt(pm / n)
    gamma = 0.1
    lb, ub = opts.equilibration_lb, opts.equilibration_ub

    u = np.zeros(pm)
    v = np.zeros(n)
    u_avg = np.zeros(pm)
    v_avg = np.zeros(n)
    M2 = Md * Md

    for it in range(opts.equilibration_iters):
        E2 = np.exp(2 * u)
        D2 = np.exp(2 * v)
        # row/col squared norms of E M D without forming it
        row_norms = E2 * (M2 @ D2)
        col_norms = D2 * (M2.T @ E2)
        step = 2.0 / (gamma * (it + 1.0))
        u = np.clip(u - step * (row_norms - alpha2 + gamma * u), lb, ub)
        v = v - step * (col_norms - beta2 + gamma * v)
        v[:] = v.sum() / n  # reference collapses columns to their mean
        np.clip(v, 0.0, ub, out=v)
        u_avg = 2 * u / (it + 2.0) + it * u_avg / (it + 2.0)
        v_avg = 2 * v / (it + 2.0) + it * v_avg / (it + 2.0)

    E = np.exp(u_avg)
    D = np.exp(v_avg)

    p_ = setup.layout.p
    if sparse:
        import scipy.sparse as sp

        setup.A = (sp.diags(E[:p_]) @ setup.A @ sp.diags(D)).tocsc()
        setup.G = (sp.diags(E[p_:]) @ setup.G @ sp.diags(D)).tocsc()
    else:
        setup.A = E[:p_, None] * setup.A * D[None, :]
        setup.G = E[p_:, None] * setup.G * D[None, :]
    setup.b = E[:p_] * setup.b
    setup.h = E[p_:] * setup.h
    setup.c = D * setup.c
    return Equilibration(E=E, D=D)

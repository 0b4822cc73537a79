"""Max-cut SDP relaxation (reference: README.md:58-113, examples/jump.jl).

    max  0.25 * <W, X>   s.t.  diag(X) = 1,  X psd.
"""

from __future__ import annotations

import numpy as np

from ..api import Optimizer
from ..options import Options
from ..problem import ConicProblem
from ..utils.vech import sympackedlen, tri_ij


def maxcut_problem(W: np.ndarray, options: Options | None = None) -> tuple:
    """Build the max-cut relaxation; returns (problem, Xidx)."""
    W = np.asarray(W, dtype=np.float64)
    n = W.shape[0]
    opt = Optimizer(options)
    X = opt.add_psd_var(n)
    for i in range(n):
        opt.add_eq_constraint({int(X[i, i]): 1.0}, 1.0)
    opt.set_objective(opt.psd_inner_product_coeffs(X, 0.25 * W), sense="max")
    return opt.build_problem(), X


def maxcut_matrices(W: np.ndarray):
    """Raw (c, A, b) in scaled-triangle variable space for BATCHED solving.

    All max-cut instances of the same side share A and b; only c differs —
    which is what makes a 1024-instance sweep a single vmapped solve.
    Returns (c_tri, A, b) where variables are raw triangle entries.
    """
    W = np.asarray(W, dtype=np.float64)
    n = W.shape[0]
    tl = sympackedlen(n)
    i, j = tri_ij(n)
    # minimization vector for "max 0.25<W,X>": c = -0.25 * (2 - diag) * W_ij
    mult = np.where(i == j, 1.0, 2.0)
    c = -0.25 * mult * W[i, j]
    A = np.zeros((n, tl))
    diag_pos = (j * (j + 1)) // 2 + i
    for d in range(n):
        A[d, (d * (d + 1)) // 2 + d] = 1.0
    b = np.ones(n)
    return c, A, b


def random_graph_weights(seed: int, n: int, density: float = 0.5) -> np.ndarray:
    """Random symmetric weight matrix for benchmark sweeps."""
    rng = np.random.RandomState(seed)
    mask = rng.rand(n, n) < density
    Wu = np.triu(rng.randn(n, n) * mask, 1)
    return Wu + Wu.T


def solve_maxcut(W, options: Options | None = None, **kwargs):
    """Solve one max-cut relaxation; returns (X, result)."""
    from ..solver import solve

    problem, Xidx = maxcut_problem(W, options)
    if kwargs:
        options = (options or Options()).replace(**kwargs)
    res = solve(problem, options)
    return res.primal[Xidx], res

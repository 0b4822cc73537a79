"""Schema-faithful stand-in for the slice of cvxpy that
``proxsdp_tpu.cvxpy_interface`` consumes.

cvxpy cannot be installed in this image (no network egress), so the
adapter's real code path — dims extraction, ``solve_cone_program``
dispatch, Solution construction, ``unpack_results`` hand-off — is
exercised against this fake, whose shapes mirror cvxpy 1.4's SCS
ConicSolver schema exactly:

* ``problem.get_problem_data(cvxpy.SCS)`` returns ``(data, chain,
  inverse_data)`` with ``data = {"c", "A", "b", "dims"}``;
* ``data["dims"]`` exposes ``zero``/``nonneg``/``soc``/``psd``/``exp``/
  ``p3d`` attributes (cvxpy ``ConeDims``);
* ``chain.solver`` carries ``VAR_ID``/``DUAL_VAR_ID`` class attributes;
* ``problem.unpack_results(solution, chain, inverse_data)`` consumes a
  ``cvxpy.reductions.solution.Solution`` and sets ``problem.value``.

The SCS standard form is ``min c'x  s.t.  Ax + s = b, s in K`` with PSD
rows packed lower-triangle column-major, off-diagonals scaled by sqrt(2)
— the same convention ``proxsdp_tpu.ingest`` implements (ingest.py:160).

Tests inject this module as ``sys.modules["cvxpy"]`` (plus the
``cvxpy.reductions.solution`` submodule) via ``install()``.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class SCS:  # marker class, mirrors cvxpy.SCS
    VAR_ID = "x"
    DUAL_VAR_ID = "y"


class ConeDims:
    def __init__(self, zero=0, nonneg=0, soc=(), psd=(), exp=0, p3d=()):
        self.zero = zero
        self.nonneg = nonneg
        self.soc = list(soc)
        self.psd = list(psd)
        self.exp = exp
        self.p3d = list(p3d)


class Solution:
    """cvxpy.reductions.solution.Solution signature (cvxpy 1.4)."""

    def __init__(self, status, opt_val, primal_vars, dual_vars, attr):
        self.status = status
        self.opt_val = opt_val
        self.primal_vars = primal_vars
        self.dual_vars = dual_vars
        self.attr = attr


def failure_solution(status, attr=None):
    return Solution(status, None, {}, {}, attr or {})


class _Chain:
    def __init__(self):
        self.solver = SCS()


class Problem:
    """A pre-lowered problem: the test supplies the SCS-form data that
    real cvxpy's reduction chain would produce, plus the objective sign
    (+1 minimize / -1 maximize) its inverse chain would re-apply."""

    def __init__(self, c, A, b, dims: ConeDims, sense_sign=1.0, offset=0.0):
        self._data = {
            "c": np.asarray(c, np.float64),
            "A": A,
            "b": np.asarray(b, np.float64),
            "dims": dims,
        }
        self._sign = sense_sign
        self._offset = offset
        self.value = None
        self.status = None
        self.unpacked = None  # the Solution handed to unpack_results

    def get_problem_data(self, solver):
        assert solver is SCS, "adapter must lower via cvxpy's SCS form"
        return self._data, _Chain(), {"sign": self._sign}

    def unpack_results(self, solution, chain, inverse_data):
        self.unpacked = solution
        self.status = solution.status
        if solution.opt_val is None or solution.status.startswith(
            ("infeasible", "unbounded")
        ):
            self.value = -np.inf if self._sign < 0 else np.inf
            return
        self.value = self._sign * solution.opt_val + self._offset


def install(monkeypatch):
    """Register the fake as cvxpy in sys.modules (monkeypatch-scoped)."""
    mod = types.ModuleType("cvxpy")
    mod.SCS = SCS
    reductions = types.ModuleType("cvxpy.reductions")
    solution_mod = types.ModuleType("cvxpy.reductions.solution")
    solution_mod.Solution = Solution
    solution_mod.failure_solution = failure_solution
    reductions.solution = solution_mod
    mod.reductions = reductions
    monkeypatch.setitem(sys.modules, "cvxpy", mod)
    monkeypatch.setitem(sys.modules, "cvxpy.reductions", reductions)
    monkeypatch.setitem(sys.modules, "cvxpy.reductions.solution", solution_mod)
    return mod


# ---------------------------------------------------------------------------
# hand-lowered SCS forms (what real cvxpy's get_problem_data would emit)
# ---------------------------------------------------------------------------


def maxcut_scs_problem(W):
    """max <W/4, X> s.t. diag(X)=1, X PSD, lowered to SCS form.

    Variables: packed lower-triangle col-major of X (off-diag * sqrt2).
    Rows: n zero-cone rows (diag = 1), then n(n+1)/2 PSD rows (s = x).
    """
    import scipy.sparse as sp

    n = W.shape[0]
    C = 0.25 * W
    tri = [(i, j) for j in range(n) for i in range(j, n)]  # lower, colmajor
    m = len(tri)
    c = np.array(
        [-C[i, j] if i == j else -np.sqrt(2.0) * C[i, j] for i, j in tri]
    )
    diag_pos = [k for k, (i, j) in enumerate(tri) if i == j]
    A_eq = sp.lil_matrix((n, m))
    for r, k in enumerate(diag_pos):
        A_eq[r, k] = 1.0
    A = sp.vstack([A_eq.tocsc(), -sp.identity(m, format="csc")]).tocsc()
    b = np.concatenate([np.ones(n), np.zeros(m)])
    dims = ConeDims(zero=n, psd=[n])
    return Problem(c, A, b, dims, sense_sign=-1.0), tri


def bounded_lp_scs_problem():
    """min x s.t. x >= 1  ->  c=[1], -x + s = -1, s in R+.  opt = 1, y = 1."""
    import scipy.sparse as sp

    c = np.array([1.0])
    A = sp.csc_matrix(np.array([[-1.0]]))
    b = np.array([-1.0])
    return Problem(c, A, b, ConeDims(nonneg=1), sense_sign=1.0)


def soc_scs_problem():
    """min t s.t. ||(3,4)|| <= t  ->  opt t = 5.

    SCS rows: s = (t, 3, 4) in SOC(3):  A = [[-1],[0],[0]], b = (0,3,4).
    """
    import scipy.sparse as sp

    c = np.array([1.0])
    A = sp.csc_matrix(np.array([[-1.0], [0.0], [0.0]]))
    b = np.array([0.0, 3.0, 4.0])
    return Problem(c, A, b, ConeDims(soc=[3]), sense_sign=1.0)


def infeasible_lp_scs_problem():
    """min x s.t. x <= 0, x >= 1 (infeasible)."""
    import scipy.sparse as sp

    c = np.array([1.0])
    A = sp.csc_matrix(np.array([[1.0], [-1.0]]))
    b = np.array([0.0, -1.0])
    return Problem(c, A, b, ConeDims(nonneg=2), sense_sign=1.0)

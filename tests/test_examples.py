"""The examples/ scripts must keep solving (reference CI exercises its
examples indirectly through moitest; we run ours directly)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_optimizer_api_example():
    from examples.optimizer_api import build_and_solve

    res, x, y = build_and_solve(verbose=False)
    assert res.status == 1
    # max 5x + 3y s.t. x <= 2, x + 5y <= 3 -> x=2, y=0.2 -> 10.6
    assert abs(res.objval - 10.6) < 5e-2
    assert abs(x - 2.0) < 1e-2 and abs(y - 0.2) < 1e-2


def test_sos_example():
    from examples.sos import build_and_solve

    res, t = build_and_solve()
    assert res.status == 1
    # reference sos.jl prints -0.17700 at its default tolerance; our
    # 1e-7-gap solve gives -0.17798 (SOS bound below the true min 0 —
    # this polynomial is the nonneg-but-not-SOS showcase)
    assert -0.185 < t < -0.170, t

"""Solver result container (reference: src/structs.jl:60-81)."""

from __future__ import annotations

import dataclasses

import numpy as np

STATUS_STRINGS = {
    0: "Problem not solved",
    1: "Optimal solution found",
    2: "Time limit hit",
    3: "Iteration limit hit",
    4: "Infeasible or unbounded",
    5: "Unbounded",  # dual infeasible
    6: "Infeasible",
}

# mapping to MOI-style termination names (reference: src/MOI_wrapper.jl:381-399)
TERMINATION_STATUS = {
    0: "OPTIMIZE_NOT_CALLED",
    1: "OPTIMAL",
    2: "TIME_LIMIT",
    3: "ITERATION_LIMIT",
    4: "INFEASIBLE_OR_UNBOUNDED",
    5: "DUAL_INFEASIBLE",
    6: "INFEASIBLE",
}


@dataclasses.dataclass
class Result:
    status: int = 0
    status_string: str = "Problem not solved"
    primal: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    dual_cone: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    dual_eq: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    dual_in: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    slack_eq: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    slack_in: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(0))
    primal_residual: float = float("nan")
    dual_residual: float = float("nan")
    objval: float = float("nan")
    dual_objval: float = float("nan")
    gap: float = float("nan")
    time: float = float("nan")
    iter: int = -1
    final_rank: int = -1
    primal_feasible_user_tol: bool = False
    dual_feasible_user_tol: bool = False
    certificate_found: bool = False
    result_count: int = 0

    @property
    def termination_status(self) -> str:
        return TERMINATION_STATUS.get(self.status, "OTHER_ERROR")

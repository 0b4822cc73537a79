"""Solver-state checkpoint/resume.

The reference has NO checkpointing (SURVEY.md §5: a dead ``WarmStart``
struct, structs.jl:94-98, and a roadmap note README.md:145-148).  Here the
entire PDHG state is a flat pytree of arrays, so a checkpoint is one
``np.savez`` — this closes that gap and makes multi-hour solves (and
preemptible-TPU runs) restartable.

Write is atomic (tmp file + rename): a preemption mid-save never corrupts
the previous checkpoint.
"""

from __future__ import annotations

import os

import numpy as np

CKPT_VERSION = 1


def save_checkpoint(path: str, state, phase32: bool) -> None:
    """Serialize a solver ``State`` (+ hybrid-phase flag) to ``path``."""
    arrs = {}
    for name in type(state)._fields:
        v = getattr(state, name)
        if name == "warm":
            arrs["__warm_len__"] = np.asarray(len(v))
            for i, w in enumerate(v):
                arrs[f"__warm_{i}__"] = np.asarray(w)
        else:
            arrs[name] = np.asarray(v)
    arrs["__phase32__"] = np.asarray(bool(phase32))
    arrs["__version__"] = np.asarray(CKPT_VERSION)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Return ``(state, phase32)`` saved by :func:`save_checkpoint`."""
    from ..solver import State

    with np.load(path) as z:
        version = int(z["__version__"])
        if version != CKPT_VERSION:
            raise ValueError(
                f"checkpoint version {version} != supported {CKPT_VERSION}"
            )
        warm = tuple(
            z[f"__warm_{i}__"] for i in range(int(z["__warm_len__"]))
        )
        fields = {
            name: z[name] for name in State._fields if name != "warm"
        }
        phase32 = bool(z["__phase32__"])
    return State(warm=warm, **fields), phase32

"""proxsdp_tpu — a TPU-native conic SDP solver.

Brand-new JAX/XLA implementation with the capabilities of ProxSDP.jl
(primal-dual hybrid gradient with approximate low-rank PSD projection;
reference mounted at /root/reference, arXiv:1810.05231).

The compute path is jit-compiled XLA with static shapes throughout; the
PSD projection uses a batched static-shape Lanczos (ops/lanczos.py); scale
out happens through jax.sharding (parallel/).

Double precision is enabled at import because conic solves at the
reference's default tolerances (1e-4..1e-7) need f64 accumulation; set
``PROXSDP_TPU_NO_X64=1`` before import to opt out (then use
Options(dtype="float32")).
"""

from __future__ import annotations

import os

import jax as _jax

if not os.environ.get("PROXSDP_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: solver programs are recompiled per
# problem geometry; caching them on disk makes repeat runs (benchmarks,
# CLI invocations) start in milliseconds instead of minutes on backends
# with slow compile RPCs. Opt out with PROXSDP_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("PROXSDP_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "PROXSDP_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "proxsdp_tpu", "xla"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .options import Options, make_options  # noqa: E402
from .problem import ConeLayout, ConicProblem, preprocess  # noqa: E402
from .result import Result, STATUS_STRINGS, TERMINATION_STATUS  # noqa: E402
from .solver import solve  # noqa: E402
from .api import Optimizer, solve_sdp  # noqa: E402
from .ingest import ConeDims, ConeSolution, solve_cone_program  # noqa: E402
from .utils.vech import ivec, ivech, sympackedlen, vech  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Options",
    "make_options",
    "ConicProblem",
    "ConeLayout",
    "preprocess",
    "Result",
    "STATUS_STRINGS",
    "TERMINATION_STATUS",
    "solve",
    "solve_sdp",
    "Optimizer",
    "ConeDims",
    "ConeSolution",
    "solve_cone_program",
    "ivec",
    "ivech",
    "vech",
    "sympackedlen",
]

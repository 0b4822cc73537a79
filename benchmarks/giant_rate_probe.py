"""Where does maxG55's ~1 s/iter go?  Microbenchmark the side-5000
device primitives and one solver chunk against each other.

The full-budget run (tpu_queue_r5/maxG55_full.csv) crawled at ~0.5
it/s and the k=128 subspace probe still ~1 s/iter, while the matmul
speed-of-light for one PDHG iteration at side 5000 is single-digit
milliseconds.  This probe times, on the real chip:
  1. raw (5000x5000)@(5000x128) and (5000x5000)@(5000x5000) matmuls
  2. a Newton-Schulz polar pass (the rejection-fallback cost)
  3. one compiled solver chunk of N iterations on the real maxG55
     layout (the number the chunk controller actually sees)

Usage: python benchmarks/giant_rate_probe.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--side", type=int, default=5000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    s = args.side
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (s, s), jnp.float32)
    X = (X + X.T) / 2
    Q = jax.random.normal(key, (s, 128), jnp.float32)

    mm_thin = jax.jit(lambda a, b: a @ b)
    t = bench(mm_thin, X, Q)
    print(f"raw ({s}x{s})@({s}x128) f32: {t * 1e3:.2f} ms "
          f"({2 * s * s * 128 / t / 1e12:.1f} TFLOP/s)")

    t = bench(mm_thin, X, X)
    print(f"raw ({s}x{s})@({s}x{s}) f32: {t * 1e3:.2f} ms "
          f"({2 * s ** 3 / t / 1e12:.1f} TFLOP/s)")

    hi = jax.lax.Precision.HIGHEST
    mm_hi = jax.jit(lambda a, b: jnp.matmul(a, b, precision=hi))
    t = bench(mm_hi, X, Q)
    print(f"HIGHEST ({s}x{s})@({s}x128): {t * 1e3:.2f} ms")
    t_full_hi = bench(mm_hi, X, X)
    print(f"HIGHEST ({s}x{s})@({s}x{s}): {t_full_hi * 1e3:.2f} ms "
          f"({2 * s ** 3 / t_full_hi / 1e12:.1f} TFLOP/s)")

    # one Newton-Schulz polar pass ~ 2 full matmuls at HIGHEST
    print(f"-> one NS polar pass ~ {2 * t_full_hi * 1e3:.0f} ms; "
          f"18 passes ~ {36 * t_full_hi:.1f} s")

    # real solver chunk on the maxG55 layout
    from proxsdp_tpu.models.sdplib import sdplib_problem
    import proxsdp_tpu as px

    path = os.path.join(
        os.environ.get("SDPLIB_DIR", "/root/reference/test/data"),
        "maxG55.dat-s",
    )
    if not os.path.exists(path):
        print("maxG55.dat-s not found; skipping chunk timing")
        return
    opts = px.Options(time_limit=10_000, max_iter=args.iters)
    problem, _ = sdplib_problem(path, opts)
    from proxsdp_tpu.solver import solve

    t0 = time.time()
    res = solve(problem, opts)
    dt = time.time() - t0
    print(f"solve(max_iter={args.iters}): {dt:.1f} s total, "
          f"iters={res.iter}, {dt / max(res.iter, 1) * 1e3:.0f} ms/iter "
          "(includes compile + finalize)")


if __name__ == "__main__":
    main()

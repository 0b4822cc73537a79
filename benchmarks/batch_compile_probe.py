"""Probe the axon batched-program compile blowup (BASELINE r1: B=8 ~3min,
B=128 >50min, abandoned).  Times solve_batch at growing B; with sides > 32
the auto projection mode runs the eigh-free batch subspace program, which
is the designed fix for the blowup (the vmapped eigh).

Usage: python benchmarks/batch_compile_probe.py [side]
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import proxsdp_tpu as px
from proxsdp_tpu.models.maxcut import maxcut_problem, random_graph_weights
from proxsdp_tpu.parallel.batch import solve_batch

side = int(sys.argv[1]) if len(sys.argv) > 1 else 40
for B in (32, 64, 128):
    probs = [maxcut_problem(random_graph_weights(s, side))[0] for s in range(B)]
    t0 = time.time()
    res = solve_batch(probs, px.Options(time_limit=600))
    dt = time.time() - t0
    ok = sum(r.status == 1 for r in res)
    print(f"B={B}: {ok}/{B} optimal in {dt:.1f}s", flush=True)

# the BASELINE.json headline config: the 1024-instance max-cut sweep
# (SURVEY §2.3 DP row).  Report SDPs/s/chip with compile amortized out
# (solve twice: first includes compile, second is the steady-state rate).
B, s16 = 1024, 16
probs = [maxcut_problem(random_graph_weights(s, s16))[0] for s in range(B)]
t0 = time.time()
res = solve_batch(probs, px.Options(time_limit=1200))
t_cold = time.time() - t0
t0 = time.time()
res = solve_batch(probs, px.Options(time_limit=1200))
t_warm = time.time() - t0
ok = sum(r.status == 1 for r in res)
print(
    f"sweep1024 side={s16}: {ok}/{B} optimal; cold {t_cold:.1f}s, warm "
    f"{t_warm:.1f}s = {B / t_warm:.1f} SDPs/s/chip",
    flush=True,
)

"""Probe the axon batched-program compile blowup (BASELINE r1: B=8 ~3min,
B=128 >50min, abandoned).  Times solve_batch at growing B; with sides > 32
the auto projection mode runs the eigh-free batch subspace program, which
is the designed fix for the blowup (the vmapped eigh).

Writes one CSV row per configuration (incrementally) to
benchmarks/results/batch_tpu.csv: B, side, compile+first-solve s, warm s,
instances/s/chip, optimal count, backend, commit.

Usage: python benchmarks/batch_compile_probe.py [side] [out.csv]
"""
import csv
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import proxsdp_tpu as px
from proxsdp_tpu.models.maxcut import maxcut_problem, random_graph_weights
from proxsdp_tpu.parallel.batch import solve_batch

side = int(sys.argv[1]) if len(sys.argv) > 1 else 40
out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(__file__), "results", "batch_tpu.csv"
)
try:
    commit = subprocess.run(
        ["git", "-C", os.path.dirname(os.path.dirname(__file__)) or ".",
         "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, timeout=10,
    ).stdout.strip() or "unknown"
except Exception:
    commit = "unknown"

out_f = open(out_path, "w", newline="")
writer = csv.DictWriter(out_f, fieldnames=[
    "B", "side", "cold_s", "warm_s", "sdps_per_s", "optimal", "backend",
    "commit",
])
writer.writeheader()
out_f.flush()


def run_config(B, s):
    probs = [maxcut_problem(random_graph_weights(i, s))[0] for i in range(B)]
    opts = px.Options(time_limit=1200)
    t0 = time.time()
    res = solve_batch(probs, opts)
    cold = time.time() - t0
    t0 = time.time()
    res = solve_batch(probs, opts)
    warm = time.time() - t0
    ok = sum(r.status == 1 for r in res)
    row = dict(
        B=B, side=s, cold_s=round(cold, 1), warm_s=round(warm, 2),
        sdps_per_s=round(B / warm, 2), optimal=ok,
        backend=jax.default_backend(), commit=commit,
    )
    writer.writerow(row)
    out_f.flush()
    print(f"B={B} side={s}: {ok}/{B} optimal; cold {cold:.1f}s, warm "
          f"{warm:.2f}s = {B / warm:.1f} SDPs/s/chip", flush=True)
    jax.clear_caches()


for B in (32, 64, 128, 256):
    run_config(B, side)

# the BASELINE.json headline config: the 1024-instance max-cut sweep
# (SURVEY §2.3 DP row).  side 16 <= 32 means the vmapped-eigh program —
# exactly the historical blowup shape; if it stalls, the B<=256 side-40
# rows above (the eigh-free batch subspace program) stand on their own.
run_config(1024, 16)
out_f.close()
print(f"wrote {out_path}")

import proxsdp_tpu as px
from proxsdp_tpu.models.sdplib import sdplib_problem
from proxsdp_tpu.solver import solve
import time
opts = px.Options(tol_gap=1e-4, tol_feasibility=1e-4, step_balance="ratio")
problem, _ = sdplib_problem('/root/reference/test/data/mcp250-1.dat-s', opts)
res = solve(problem, opts)   # compile run
t0 = time.time()
res = solve(problem, opts)   # warm run
print("mcp250-1 ratio warm:", res.status, res.objval, res.iter, round(time.time()-t0,2), "s", flush=True)
opts2 = px.Options(tol_gap=1e-4, tol_feasibility=1e-4, time_limit=280, step_balance="ratio")
problem2, _ = sdplib_problem('/root/reference/test/data/gpp500-1.dat-s', opts2)
t0 = time.time()
res2 = solve(problem2, opts2)
print("gpp500-1 ratio warm:", res2.status, res2.objval, res2.iter, round(time.time()-t0,2), "s", flush=True)

"""Benchmark: batched scalarization-LP throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is scalarization LPs/s on one chip (the hot loop of the
Benson algorithm, see BASELINE.json).  The baseline denominator is a
serial CPU LP solver (scipy/HiGHS) on identical instances — the stand-in
for the reference's serial GLPK loop (bslv_algs.c:863-895), which cannot
be built here (no GLPK).  vs_baseline = our LPs/s / serial LPs/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_instances(M, N, B, seed=0, dtype=np.float32):
    """Random feasible bounded LP batch sharing one constraint matrix:
    min c'x  s.t.  Ax <= b (b = A x0 + margin), 0 <= x <= 10."""
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((M, N)) / np.sqrt(N)).astype(dtype)
    x0 = rng.random((B, N)).astype(dtype)
    b = (x0 @ A.T + 0.5 + rng.random((B, M))).astype(dtype)
    c = rng.standard_normal((B, N)).astype(dtype)
    row_lb = np.full((B, M), -np.inf, dtype)
    col_lb = np.zeros((B, N), dtype)
    col_ub = np.full((B, N), 10.0, dtype)
    return A, c, row_lb, b, col_lb, col_ub


def run_device(A, c, row_lb, row_ub, col_lb, col_ub, reps=3):
    """Fastest available device path: the Pallas per-LP kernel (no
    lockstep tail, tableau in VMEM) on TPU, with the fused-update XLA
    lockstep solver as the fallback for backends where Mosaic is
    unavailable."""
    import jax

    # persistent compile cache: the Mosaic kernel takes minutes to
    # compile through the remote-TPU tunnel; repeat runs hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bensolve_tpu.lp import simplex

    dtype = A.dtype.type
    B = c.shape[0]

    if jax.default_backend() == "tpu":
        from bensolve_tpu.lp import pallas_simplex

        def solve(cc):
            return pallas_simplex.lp_batch_pallas(
                A, cc, row_lb, row_ub, col_lb, col_ub)
    else:
        def solve(cc):
            return simplex.solve_batch(A, cc, row_lb, row_ub, col_lb,
                                       col_ub, dtype=dtype, max_chunk=B)

    t_c0 = time.perf_counter()
    try:
        res = solve(c)
    except Exception as e:  # Mosaic lowering failure etc. -> XLA path
        print(f"# pallas path failed ({type(e).__name__}), "
              "falling back to XLA solver", file=sys.stderr)

        def solve(cc):
            return simplex.solve_batch(A, cc, row_lb, row_ub, col_lb,
                                       col_ub, dtype=dtype, max_chunk=B)
        t_c0 = time.perf_counter()
        res = solve(c)
    compile_s = time.perf_counter() - t_c0
    n_opt = int((res.status == simplex.OPTIMAL).sum())

    times = []
    for r in range(reps):
        # perturb objectives so nothing is cached as a constant
        c2 = c * (1.0 + 0.01 * (r + 1))
        t0 = time.perf_counter()
        res = solve(c2)
        times.append(time.perf_counter() - t0)
    best = min(times)
    return B / best, n_opt, compile_s, res


def run_serial_baseline(A, c, row_lb, row_ub, col_lb, col_ub, k=24):
    """Serial scipy/HiGHS on the first k instances."""
    from scipy.optimize import linprog

    M, N = A.shape
    t0 = time.perf_counter()
    n_ok = 0
    for i in range(k):
        res = linprog(np.float64(c[i]), A_ub=np.float64(A),
                      b_ub=np.float64(row_ub[i]),
                      bounds=list(zip(np.float64(col_lb[i]),
                                      np.float64(col_ub[i]))),
                      method="highs")
        n_ok += res.status == 0
    dt = time.perf_counter() - t0
    return k / dt, n_ok


def main():
    M, N, B = 96, 96, 4096
    args = make_instances(M, N, B)
    lps_per_s, n_opt, compile_s, _ = run_device(*args)
    base_rate, base_ok = run_serial_baseline(*args)
    out = {
        "metric": "scalarization_LPs_per_s_per_chip",
        "value": round(lps_per_s, 2),
        "unit": "LP/s",
        "vs_baseline": round(lps_per_s / base_rate, 3),
    }
    print(json.dumps(out))
    print(f"# batch={B} size={M}x{N} optimal={n_opt}/{B} "
          f"compile={compile_s:.1f}s serial_highs={base_rate:.1f} LP/s "
          f"(ok {base_ok})", file=sys.stderr)


if __name__ == "__main__":
    main()

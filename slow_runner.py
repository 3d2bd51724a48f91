"""Run the LARGE reference examples (ex07 / ex09 / ex10) end-to-end on
the ambient backend and record status / wall / LP counts / support-
oracle error in SLOW_RESULTS.md.

On the TPU (ambient axon env):      python slow_runner.py ex10 ex07 ex09
On the CPU backend (for reference): JAX_PLATFORMS=cpu python slow_runner.py ...

Flags per example mirror the reference's own recommendations
(/root/reference/ex/example07.m:9, example09.m:10): loose epsilons and
f32 LP arithmetic for ex07/ex09; ex10 runs at defaults.  ex09's scalar
LPs route through the IPM backend (BENSOLVE_IPM_MIN) — every simplex
variant is pivot-count-bound on the TPU runtime's ~ms/step floor.
"""
import json
import os
import sys
import time

os.environ.setdefault("BENSOLVE_IPM_BYTES", "6000000000")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _setup_compile_cache():
    """Persistent XLA compile cache: a fresh-shape IPM segment program
    at ex09 scale takes ~10 min to compile through the remote-TPU
    tunnel; resumed / repeated runs must not pay that again."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CONFIGS = {
    "ex07": dict(eps_benson_phase2=0.05, lp_dtype="float32",
                 message_level=2, lp_ipm_min=2000, env={}),
    "ex09": dict(eps_benson_phase2=1e-2, lp_dtype="float32",
                 message_level=2, lp_message_level=2, lp_ipm_min=2000,
                 # short device pass (easy majority converges in
                 # ~60-120 iterations) + exact host HiGHS for the rest:
                 # measured round 5, HiGHS does a straggler in ~1.5 s
                 # vs minutes of restart-heavy f32 device work
                 env={"BENSOLVE_IPM_MAXIT": "180",
                      "BENSOLVE_HOST_FALLBACK_MAX": "64"}),
    "ex10": dict(message_level=2, env={}),
}


def run_one(ex):
    import jax
    import numpy as np

    _setup_compile_cache()

    from bensolve_tpu.algs.driver import solve
    from bensolve_tpu.vlp.options import Options
    from bensolve_tpu.vlp.reader import read_vlp
    from tests.test_e2e import check_support

    cfg = dict(CONFIGS[ex])
    env = cfg.pop("env")
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        vlp = read_vlp(f"/root/reference/ex/{ex}.vlp")
        print(f"== {ex}: q={vlp.q} m={vlp.m} n={vlp.n} backend="
              f"{jax.default_backend()}", flush=True)
        # phase-2 round snapshots so a wall-clock-killed huge run can be
        # resumed (solve(..., resume=ckpt) across driver sessions)
        ckpt = f"/tmp/bensolve_ckpt_{ex}"
        resume = ckpt if (os.environ.get("BENSOLVE_RESUME") == "1"
                          and os.path.exists(ckpt)) else None
        t0 = time.time()
        r = solve(vlp, Options(write_files=False, checkpoint_path=ckpt,
                               **cfg), resume=resume)
        wall = time.time() - t0
        sup_tol = {"ex07": 0.05, "ex09": 1e-2, "ex10": 1e-4}[ex]
        sup = "n/a"
        if r.status.name == "OPTIMAL":
            try:
                check_support(r, n_samples=8, tol=sup_tol)
                sup = f"pass@{sup_tol}"
            except AssertionError:
                sup = f"FAIL@{sup_tol}"
        row = dict(ex=ex, status=r.status.name, wall_s=round(wall, 1),
                   lps=r.stats.lps, rounds=r.stats.rounds,
                   points=len(r.primal_points),
                   directions=len(r.primal_directions),
                   support=sup, backend=jax.default_backend(),
                   loose_cuts=getattr(r.stats, "loose_cuts", 0),
                   loose_deferred=getattr(r.stats, "loose_deferred", 0))
        print(json.dumps(row), flush=True)
        return row
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    if os.environ.get("BENSOLVE_CPU") == "1":
        # JAX_PLATFORMS is ignored once sitecustomize has imported jax
        # and registered the tunnel backend — use the config API
        import jax

        jax.config.update("jax_platforms", "cpu")
    rows = [run_one(ex) for ex in (sys.argv[1:] or ["ex10", "ex07", "ex09"])]
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    lines = ["# SLOW_RESULTS — large reference examples, recorded runs",
             "",
             f"Last updated {stamp} (`python slow_runner.py`).  Flags per",
             "example follow the reference's own advice",
             "(`ex/example07.m:9`, `ex/example09.m:10`).",
             "",
             "| ex | backend | status | wall (s) | LPs | rounds | points "
             "| dirs | support oracle | loose cuts |",
             "|---|---|---|---|---|---|---|---|---|---|"]
    prev = {}
    if os.path.exists("SLOW_RESULTS.md"):
        for ln in open("SLOW_RESULTS.md"):
            if ln.startswith("| ex0") or ln.startswith("| ex1"):
                prev[(ln.split("|")[1].strip(), ln.split("|")[2].strip())] = ln.rstrip()
    for row in rows:
        key = (row["ex"], row["backend"])
        prev[key] = (f"| {row['ex']} | {row['backend']} | {row['status']} "
                     f"| {row['wall_s']} | {row['lps']} | {row['rounds']} "
                     f"| {row['points']} | {row['directions']} "
                     f"| {row['support']} | {row['loose_cuts']} "
                     f"({row['loose_deferred']} deferred) |")
    lines += [prev[k] for k in sorted(prev)]
    lines.append("")
    open("SLOW_RESULTS.md", "w").write("\n".join(lines))
    print("wrote SLOW_RESULTS.md", flush=True)


if __name__ == "__main__":
    main()

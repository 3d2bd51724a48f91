"""ex09 probe: solve the largest reference instance on the real TPU.

Run with ambient env (JAX_PLATFORMS=axon).  Flags mirror the reference
recommendation (/root/reference/ex/example09.m:10): -e 1e-2, f32
arithmetic.  The scalar LPs route through the MXU-native IPM backend
(simplex variants are pivot-count-bound on the TPU runtime); the
persistent compile cache makes repeat runs start fast.
"""
import os
import sys
import time

os.environ.setdefault("BENSOLVE_IPM_MIN", "2000")
os.environ.setdefault("BENSOLVE_IPM_BYTES", "6000000000")

from bensolve_tpu.algs.driver import solve
from bensolve_tpu.vlp.options import Options
from bensolve_tpu.vlp.reader import read_vlp

t0 = time.time()
vlp = read_vlp("/root/reference/ex/ex09.vlp")
print(f"parsed in {time.time()-t0:.1f}s: q={vlp.q} m={vlp.m} n={vlp.n}",
      flush=True)

opt = Options(lp_dtype="float32", eps_benson_phase2=1e-2,
              message_level=2, lp_message_level=2, write_files=False)
t0 = time.time()
r = solve(vlp, opt)
dt = time.time() - t0
print(f"status={r.status.name} wall={dt:.1f}s lps={r.stats.lps} "
      f"rounds={r.stats.rounds} cuts={r.stats.cuts}", flush=True)
if r.pair is not None:
    print("primal points:", len(r.primal_points),
          "dirs:", len(r.primal_directions))
    print(r.primal_points[:10])
sys.exit(0 if r.status.name == "OPTIMAL" else 1)

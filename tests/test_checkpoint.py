"""Round-level checkpoint / resume (TPU-build subsystem; the reference
has none, SURVEY.md section 5)."""

import numpy as np

from bensolve_tpu.algs.driver import solve
from bensolve_tpu.algs.solution import SolStatus
from bensolve_tpu.vlp.options import Alg, Options
from bensolve_tpu.vlp.reader import read_vlp

EX = "/root/reference/ex"


def _vset(r):
    return sorted(map(tuple, np.round(r.primal_points, 8)))


def test_checkpoint_resume_matches(tmp_path):
    ck = str(tmp_path / "st.ckpt")
    vlp = read_vlp(f"{EX}/ex05.vlp")
    r1 = solve(vlp, Options(checkpoint_path=ck))
    assert r1.status is SolStatus.OPTIMAL
    r2 = solve(vlp, Options(), resume=ck)
    assert r2.status is SolStatus.OPTIMAL
    assert _vset(r1) == _vset(r2)


def test_checkpoint_resume_dual_alg(tmp_path):
    ck = str(tmp_path / "st.ckpt")
    vlp = read_vlp(f"{EX}/ex01.vlp")
    r1 = solve(vlp, Options(checkpoint_path=ck, alg_phase1=Alg.DUAL,
                            alg_phase2=Alg.DUAL))
    assert r1.status is SolStatus.OPTIMAL
    r2 = solve(vlp, Options(alg_phase2=Alg.DUAL), resume=ck)
    assert r2.status is SolStatus.OPTIMAL
    assert _vset(r1) == _vset(r2)

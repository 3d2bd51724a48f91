"""Differential tests: the native C++ polytope engine vs the
pure-Python oracle (same semantics by construction; these prove it)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from bensolve_tpu import native
from bensolve_tpu.poly.polytope import PolytopePair, cone_polar_v2h

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native engine unavailable")


def _random_cone_pair(seed: int, dim: int, n_gens: int):
    """Run a cone vertex enumeration on random generators and return the
    final pair state (mirrors algs.solution.cone_vertenum's usage)."""
    rng = np.random.default_rng(seed)
    pair = PolytopePair(dim, dual_v2h=cone_polar_v2h)
    gens = rng.standard_normal((n_gens, dim))
    gens[:, dim - 1] = np.abs(gens[:, dim - 1]) + 0.3  # pointed-ish cone
    for g in gens:
        pair.add_vertex(g, ideal=True)
    ok = pair.initial_approx()
    return pair, ok


def _snapshot(pair):
    out = {}
    for name, poly in (("p", pair.primal), ("d", pair.dual)):
        n = poly.cnt
        out[name] = dict(
            cnt=n,
            data=poly.data[:n].copy(),
            used=poly.used[:n].copy(),
            ideal=poly.ideal[:n].copy(),
            adj=[sorted(poly.adj[i]) for i in range(n)],
            inc=[sorted(poly.inc[i]) for i in range(n)],
        )
    return out


def _run_engine(no_native: bool, seed: int, dim: int, n: int):
    """Run _random_cone_pair in a subprocess with/without the native
    engine (the choice is process-global) and return its snapshot."""
    env = dict(os.environ)
    env.pop("BENSOLVE_TPU_NO_NATIVE", None)
    if no_native:
        env["BENSOLVE_TPU_NO_NATIVE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    code = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
sys.path.insert(0, {repr(os.path.dirname(os.path.abspath(__file__)))})
import numpy as np
from test_native_poly import _random_cone_pair, _snapshot
pair, ok = _random_cone_pair({seed}, {dim}, {n})
assert ok
import pickle
sys.stdout.buffer.write(pickle.dumps(_snapshot(pair)))
"""
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         env=env, timeout=300)
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    import pickle
    return pickle.loads(res.stdout)


@pytest.mark.parametrize("seed,dim,n", [(0, 3, 12), (1, 3, 20), (2, 4, 14),
                                        (3, 2, 10), (4, 5, 12)])
def test_native_matches_python_engine(seed, dim, n):
    a = _run_engine(False, seed, dim, n)
    b = _run_engine(True, seed, dim, n)
    for side in ("p", "d"):
        assert a[side]["cnt"] == b[side]["cnt"]
        np.testing.assert_array_equal(a[side]["used"], b[side]["used"])
        np.testing.assert_array_equal(a[side]["ideal"], b[side]["ideal"])
        np.testing.assert_allclose(a[side]["data"], b[side]["data"],
                                   rtol=0, atol=1e-12)
        assert a[side]["adj"] == b[side]["adj"]
        assert a[side]["inc"] == b[side]["inc"]


def test_native_engine_is_active_and_check_runs():
    # the random construction is not a geometrically meaningful cone
    # enumeration (see algs.solution.cone_vertenum for the real seeding),
    # so check() may report violations — but both engines must report
    # the SAME ones, and the e2e suite covers check()==[] on real solves
    pair, ok = _random_cone_pair(7, 3, 16)
    assert ok
    assert pair.primal.native
    native_errs = pair.check()
    env = dict(os.environ, BENSOLVE_TPU_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    code = """
import sys
sys.path.insert(0, %r)
sys.path.insert(0, %r)
from test_native_poly import _random_cone_pair
pair, ok = _random_cone_pair(7, 3, 16)
for e in pair.check():
    print(e)
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
       os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         env=env, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    py_errs = [ln for ln in res.stdout.splitlines() if ln.strip()]
    assert native_errs == py_errs


def test_native_rowview_protocol():
    pair, ok = _random_cone_pair(8, 3, 10)
    P = pair.primal
    row = P.adj[0]
    lst = list(row)
    assert len(row) == len(lst)
    if lst:
        assert lst[0] in row
        assert row[0] == lst[0]
    P.adj[0] = lst + [99]
    assert 99 in P.adj[0]
    P.adj[0] = lst  # restore
    assert list(P.adj[0]) == lst

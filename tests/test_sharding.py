"""Device-mesh sharding of the LP batch (runs on the virtual 8-device
CPU mesh set up in conftest)."""

import numpy as np

import jax

from bensolve_tpu.lp import simplex as sx
from bensolve_tpu.parallel import mesh as pmesh


def _instances(M, N, B, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((M, N)) / np.sqrt(N)).astype(np.float32)
    x0 = rng.random((B, N)).astype(np.float32)
    b = (x0 @ A.T + 0.5 + rng.random((B, M))).astype(np.float32)
    c = rng.standard_normal((B, N)).astype(np.float32)
    NT = M + N
    full_c = np.concatenate([np.zeros((B, M), np.float32), c], axis=1)
    lb = np.concatenate([np.full((B, M), -np.inf, np.float32),
                         np.zeros((B, N), np.float32)], axis=1)
    ub = np.concatenate([b, np.full((B, N), 10.0, np.float32)], axis=1)
    return A, full_c, lb, ub


def test_dp_sharded_matches_single_device():
    assert len(jax.devices()) >= 8
    M = N = 16
    A, c, lb, ub = _instances(M, N, 16)
    E_args = (np.asarray(A), c, lb, ub)

    ref = sx._solve_batch_jit(A, c, lb, ub, 512)
    m = pmesh.make_mesh(8, ("dp",))
    got = pmesh.solve_batch_sharded(m, A, c, lb, ub, max_iter=512)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                               rtol=1e-5, atol=1e-5)


def test_2d_mesh_benson_round():
    m = pmesh.make_mesh(8, ("dp", "tp"))
    assert m.devices.size == 8
    M = N = 16
    A, c, lb, ub = _instances(M, N, 8)
    V = np.random.default_rng(1).random((8, 2)).astype(np.float32)
    ZR = np.eye(2, dtype=np.float32)
    out = pmesh.benson_round_sharded(
        m, np.asarray(A), c[0], V, ZR, lb[0, :M], ub[0, :M],
        lb[0, M:], ub[0, M:], n_extra_offset=4, max_iter=256)
    status = np.asarray(out[0])
    assert status.shape == (8,)

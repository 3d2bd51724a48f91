"""Unit tests for the dtype-agnostic batched LU (lp/linalg.py), the
replacement for XLA's f32-only LuDecomposition custom-call."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from bensolve_tpu.lp import linalg


@pytest.mark.parametrize("m", [1, 2, 5, 17, 64])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_lu_solve_matches_scipy(m, dtype):
    rng = np.random.default_rng(m)
    A = rng.standard_normal((m, m)).astype(dtype)
    A += m * np.eye(m, dtype=dtype)  # well-conditioned
    b = rng.standard_normal((m, 3)).astype(dtype)

    lu, piv = jax.jit(linalg.lu_factor)(A)
    x = np.asarray(jax.jit(linalg.lu_solve)((lu, piv), jnp.asarray(b)))
    x_ref = scipy.linalg.solve(np.float64(A), np.float64(b))
    rtol = 1e-10 if dtype == np.float64 else 1e-3
    np.testing.assert_allclose(x, x_ref, rtol=rtol, atol=rtol)


@pytest.mark.parametrize("trans", [0, 1])
def test_lu_solve_trans_and_vector(trans):
    rng = np.random.default_rng(7)
    m = 23
    A = rng.standard_normal((m, m)) + m * np.eye(m)
    b = rng.standard_normal(m)
    lu, piv = linalg.lu_factor(jnp.asarray(A))
    x = np.asarray(linalg.lu_solve((lu, piv), jnp.asarray(b), trans=trans))
    ref = np.linalg.solve(A.T if trans else A, b)
    np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-12)


def test_lu_needs_pivoting():
    # zero on the diagonal: fails without partial pivoting
    A = jnp.asarray(np.array([[0.0, 1.0], [1.0, 0.0]]))
    b = jnp.asarray(np.array([2.0, 3.0]))
    x = np.asarray(linalg.lu_solve(linalg.lu_factor(A), b))
    np.testing.assert_allclose(x, [3.0, 2.0], atol=1e-14)


def test_lu_batched_vmap():
    rng = np.random.default_rng(0)
    B, m = 4, 12
    A = rng.standard_normal((B, m, m)) + m * np.eye(m)
    b = rng.standard_normal((B, m))
    lu, piv = jax.vmap(linalg.lu_factor)(jnp.asarray(A))
    x = np.asarray(jax.vmap(linalg.lu_solve)((lu, piv), jnp.asarray(b)))
    for i in range(B):
        np.testing.assert_allclose(x[i], np.linalg.solve(A[i], b[i]),
                                    rtol=1e-9, atol=1e-11)

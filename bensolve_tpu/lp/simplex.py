"""Batched dense bounded-variable primal simplex.

This is the TPU-native replacement for the reference's single warm-started
GLPK instance (bslv_lp.c:31, lp_solve bslv_lp.c:219-259).  Where the
reference re-parameterizes ONE LP and solves candidates serially
(bslv_algs.c:863-895), this solver takes a *batch* of LPs that share the
constraint matrix but differ in objective and bounds, and pivots all of
them in lockstep on device.

Formulation (GLPK-compatible, bslv_lp.h:60-105):

    variables   z = (s, x),  s in R^M auxiliary (rows), x in R^N structural
    equalities  E z = 0  with  E = [I | -A]          (s = A x)
    bounds      lb <= z <= ub   (+-inf allowed, lb == ub means fixed)
    objective   min c' z        (c zero on auxiliaries in practice)

All five GLPK bound types 'f','l','u','d','s' (bslv_lp.c:34-43) are plain
(lb, ub) data here, so row/column type changes are batch data, not
structure.

Algorithm: bounded-variable primal simplex with
  * composite phase-1 (costs +-1 on out-of-bounds basic variables, no
    artificial variables),
  * Dantzig pricing with Bland's rule after a degeneracy stall,
  * explicit basis inverse updated by elementary row operations and
    refactorized periodically via QR (float64 QR/triangular-solve are
    TPU-supported; LU is not),
  * exact basic primal AND dual solutions (duals in GLPK sign convention:
    row dual lambda_i >= 0 for a binding lower row bound of a min problem).

Statuses mirror lp_status_type (bslv_lp.h:44).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# status codes
RUNNING = 0
OPTIMAL = 1
INFEASIBLE = 2
UNBOUNDED = 3
ITLIM = 4

TOL_BND = 1e-9   # primal feasibility tolerance
TOL_DJ = 1e-9    # dual feasibility (reduced cost) tolerance
TOL_PIV = 1e-11  # smallest admissible pivot magnitude
BLAND_AFTER = 64  # consecutive degenerate steps before switching to Bland
REFACTOR_EVERY = 64


@dataclasses.dataclass
class LPResult:
    """Mirror of the GLPK getters used by the reference
    (bslv_lp.c:261-308)."""

    status: np.ndarray    # (B,) int
    obj: np.ndarray       # (B,) objective value c'x
    x: np.ndarray         # (B, N) structural primal values
    s: np.ndarray         # (B, M) row activities (auxiliary primals)
    row_dual: np.ndarray  # (B, M) row duals, GLPK sign
    col_dual: np.ndarray  # (B, N) reduced costs of structural variables
    iters: np.ndarray     # (B,) pivot count


def _nb_value(lb, ub, at_upper):
    """Value of a nonbasic variable resting at its active bound."""
    lo = jnp.where(jnp.isfinite(lb), lb, jnp.where(jnp.isfinite(ub), ub, 0.0))
    hi = jnp.where(jnp.isfinite(ub), ub, jnp.where(jnp.isfinite(lb), lb, 0.0))
    return jnp.where(at_upper, hi, lo)


def _e_matmul(A, v):
    """E @ v for E = [I | -A]; v has shape (..., M+N)."""
    M = A.shape[0]
    return v[..., :M] - v[..., M:] @ A.T


def _e_rmatmul(A, y):
    """E^T @ y; y has shape (..., M)."""
    return jnp.concatenate([y, -(y @ A)], axis=-1)


def _e_column(A, j):
    """Column j of E (scalar j, traced)."""
    M, N = A.shape
    eye_col = (jnp.arange(M) == j).astype(A.dtype)
    a_col = -A[:, jnp.clip(j - M, 0, N - 1)]
    return jnp.where(j < M, eye_col, a_col)


def _build_basis_matrix(A, basis):
    """B matrix (M, M) whose columns are E[:, basis[k]]."""
    M, N = A.shape
    is_aux = basis < M
    eye_cols = jax.nn.one_hot(basis, M, dtype=A.dtype).T          # (M, M)
    a_cols = -A[:, jnp.clip(basis - M, 0, N - 1)]                  # (M, M)
    return jnp.where(is_aux[None, :], eye_cols, a_cols)


def _invert_via_qr(Bmat):
    """Basis inverse through QR (f64-capable on TPU, unlike LU)."""
    Q, R = jnp.linalg.qr(Bmat)
    return jax.scipy.linalg.solve_triangular(R, Q.T, lower=False)


@dataclasses.dataclass
class _State:
    basis: jnp.ndarray      # (B, M) int32 variable index per basis slot
    in_basis: jnp.ndarray   # (B, NT) bool
    at_upper: jnp.ndarray   # (B, NT) bool (meaningful for nonbasic)
    binv: jnp.ndarray       # (B, M, M)
    xb: jnp.ndarray         # (B, M) basic variable values
    status: jnp.ndarray     # (B,) int32
    stall: jnp.ndarray      # (B,) int32 consecutive degenerate steps
    iters: jnp.ndarray      # (B,) int32
    step: jnp.ndarray       # () int32 global step counter


jax.tree_util.register_dataclass(
    _State,
    data_fields=["basis", "in_basis", "at_upper", "binv", "xb", "status",
                 "stall", "iters", "step"],
    meta_fields=[],
)


def _initial_state(A, c, lb, ub):
    B, NT = c.shape
    M, N = A.shape
    basis = jnp.tile(jnp.arange(M, dtype=jnp.int32)[None, :], (B, 1))
    in_basis = jnp.tile(
        jnp.concatenate([jnp.ones(M, bool), jnp.zeros(N, bool)])[None, :], (B, 1)
    )
    at_upper = (~jnp.isfinite(lb)) & jnp.isfinite(ub)
    zn = jnp.where(in_basis, 0.0, _nb_value(lb, ub, at_upper))
    xb = -_e_matmul(A, zn)  # rhs of E z = 0 given nonbasic rest values
    binv = jnp.tile(jnp.eye(M, dtype=c.dtype)[None], (B, 1, 1))
    zeros = jnp.zeros(B, jnp.int32)
    # crossed bounds (lb > ub) make an instance trivially infeasible, and
    # the phase-1 machinery cannot see them on NONBASIC variables (a
    # variable resting at lb quietly violates ub); reject upfront
    crossed = jnp.any(lb > ub, axis=1)
    status = jnp.where(crossed, INFEASIBLE, zeros)
    return _State(basis, in_basis, at_upper, binv, xb,
                  status, zeros, zeros, jnp.int32(0))


def _step(A, c, lb, ub, st: _State) -> _State:
    B, NT = c.shape
    M, N = A.shape
    batch = jnp.arange(B)
    running = st.status == RUNNING

    lbB = jnp.take_along_axis(lb, st.basis, axis=1)
    ubB = jnp.take_along_axis(ub, st.basis, axis=1)

    viol_lo = st.xb < lbB - TOL_BND
    viol_up = st.xb > ubB + TOL_BND
    feasible = ~jnp.any(viol_lo | viol_up, axis=1)                 # (B,)

    # effective costs: true costs in phase 2, +-1 on violating basics in ph.1
    cB_true = jnp.take_along_axis(c, st.basis, axis=1)
    cB1 = jnp.where(viol_up, 1.0, 0.0) + jnp.where(viol_lo, -1.0, 0.0)
    cB_eff = jnp.where(feasible[:, None], cB_true, cB1)

    # duals and reduced costs: y = B^-T cB, d = c_eff - E^T y
    y = jnp.einsum("bm,bmk->bk", cB_eff, st.binv)                  # (B, M)
    d = jnp.where(feasible[:, None], c, 0.0) - _e_rmatmul(A, y)    # (B, NT)

    # entering variable
    val = _nb_value(lb, ub, st.at_upper)
    can_inc = (~st.in_basis) & (val < ub)
    can_dec = (~st.in_basis) & (val > lb)
    elig_inc = can_inc & (d < -TOL_DJ)
    elig_dec = can_dec & (d > TOL_DJ)
    eligible = elig_inc | elig_dec
    use_bland = st.stall > BLAND_AFTER
    dantzig_score = jnp.where(eligible, jnp.abs(d), -jnp.inf)
    bland_score = jnp.where(eligible, -jnp.arange(NT, dtype=c.dtype), -jnp.inf)
    score = jnp.where(use_bland[:, None], bland_score, dantzig_score)
    q_idx = jnp.argmax(score, axis=1)                              # (B,)
    has_entering = jnp.any(eligible, axis=1)

    # finished instances: optimal if feasible, else proven infeasible
    finish_status = jnp.where(feasible, OPTIMAL, INFEASIBLE)
    new_status = jnp.where(running & ~has_entering, finish_status, st.status)
    act = running & has_entering                                   # will pivot

    sigma = jnp.where(
        jnp.take_along_axis(elig_inc, q_idx[:, None], axis=1)[:, 0], 1.0, -1.0
    )

    # pivot column alpha = Binv E_q, basic rates per unit entering increase
    e_col = jax.vmap(_e_column, in_axes=(None, 0))(A, q_idx)       # (B, M)
    alpha = jnp.einsum("bmk,bk->bm", st.binv, e_col)
    rate = -sigma[:, None] * alpha                                 # dxB/dt

    # ratio test (composite phase-1 aware, short-step rule)
    inc = rate > TOL_PIV
    dec = rate < -TOL_PIV
    target_inc = jnp.where(viol_lo, lbB, ubB)
    target_dec = jnp.where(viol_up, ubB, lbB)
    t_inc = jnp.where(viol_up, jnp.inf, (target_inc - st.xb) / rate)
    t_dec = jnp.where(viol_lo, jnp.inf, (target_dec - st.xb) / rate)
    t = jnp.where(inc, t_inc, jnp.where(dec, t_dec, jnp.inf))
    t = jnp.maximum(t, 0.0)
    t = jnp.where(jnp.isnan(t), jnp.inf, t)

    tmin = jnp.min(t, axis=1)                                      # (B,)
    # leaving among near-minimal ratios: largest |pivot| (stability), or
    # smallest variable index under Bland
    cand = t <= tmin[:, None] + 1e-12
    stab_score = jnp.where(cand, jnp.abs(rate), -1.0)
    basis_f = st.basis.astype(c.dtype)
    bland_leave = jnp.where(cand, -basis_f, -jnp.inf)
    leave_score = jnp.where(use_bland[:, None], bland_leave, stab_score)
    r_idx = jnp.argmax(leave_score, axis=1)                        # (B,)

    # entering variable's own opposite bound (bound flip)
    lb_q = jnp.take_along_axis(lb, q_idx[:, None], axis=1)[:, 0]
    ub_q = jnp.take_along_axis(ub, q_idx[:, None], axis=1)[:, 0]
    span = ub_q - lb_q
    span = jnp.where(jnp.isfinite(span), span, jnp.inf)
    do_flip = span < tmin
    t_star = jnp.where(do_flip, span, tmin)

    unbounded = act & feasible & ~jnp.isfinite(t_star)
    new_status = jnp.where(unbounded, UNBOUNDED, new_status)
    act = act & jnp.isfinite(t_star)

    # apply the step
    delta = jnp.where(act, sigma * t_star, 0.0)                    # (B,)
    xb_new = st.xb - delta[:, None] * alpha

    do_pivot = act & ~do_flip
    # basis change
    alpha_r = jnp.take_along_axis(alpha, r_idx[:, None], axis=1)[:, 0]
    alpha_r = jnp.where(jnp.abs(alpha_r) < TOL_PIV,
                        jnp.where(alpha_r < 0, -TOL_PIV, TOL_PIV), alpha_r)
    onehot_r = jax.nn.one_hot(r_idx, M, dtype=c.dtype)
    factor = (alpha - onehot_r) / alpha_r[:, None]
    binv_r = jnp.take_along_axis(st.binv, r_idx[:, None, None], axis=1)
    binv_new = st.binv - factor[:, :, None] * binv_r
    binv_new = jnp.where(do_pivot[:, None, None], binv_new, st.binv)

    leaving = jnp.take_along_axis(st.basis, r_idx[:, None], axis=1)[:, 0]
    entering_val = _nb_value(lb, ub, st.at_upper)
    val_q = jnp.take_along_axis(entering_val, q_idx[:, None], axis=1)[:, 0]
    xq_new = val_q + delta
    xb_new = jnp.where(
        do_pivot[:, None],
        xb_new.at[batch, r_idx].set(xq_new),
        xb_new,
    )
    basis_upd = st.basis.at[batch, r_idx].set(q_idx.astype(jnp.int32))
    basis_new = jnp.where(do_pivot[:, None], basis_upd, st.basis)

    in_basis_upd = st.in_basis.at[batch, q_idx].set(True)
    in_basis_upd = in_basis_upd.at[batch, leaving].set(False)
    in_basis_new = jnp.where(do_pivot[:, None], in_basis_upd, st.in_basis)

    # leaving variable rests at the ratio-test target bound: an increasing
    # basic variable targets ub unless it was below lb (phase-1), and vice
    # versa (see target_inc/target_dec above)
    rate_r = jnp.take_along_axis(rate, r_idx[:, None], axis=1)[:, 0]
    viol_lo_r = jnp.take_along_axis(viol_lo, r_idx[:, None], axis=1)[:, 0]
    viol_up_r = jnp.take_along_axis(viol_up, r_idx[:, None], axis=1)[:, 0]
    leave_at_upper = jnp.where(rate_r > 0, ~viol_lo_r, viol_up_r)
    at_upper_upd = st.at_upper.at[batch, leaving].set(leave_at_upper)
    # bound flip: entering variable switches bound
    q_at_upper = jnp.take_along_axis(st.at_upper, q_idx[:, None], axis=1)[:, 0]
    at_upper_flip = st.at_upper.at[batch, q_idx].set(~q_at_upper)
    at_upper_new = jnp.where(
        do_pivot[:, None], at_upper_upd,
        jnp.where((act & do_flip)[:, None], at_upper_flip, st.at_upper),
    )

    degen = act & (t_star < TOL_BND)
    stall_new = jnp.where(act, jnp.where(degen, st.stall + 1, 0), st.stall)
    iters_new = st.iters + act.astype(jnp.int32)

    st2 = _State(basis_new, in_basis_new, at_upper_new, binv_new, xb_new,
                 new_status, stall_new, iters_new, st.step + 1)

    # periodic refactorization for numerical hygiene
    def refactor(s):
        bmat = jax.vmap(_build_basis_matrix, in_axes=(None, 0))(A, s.basis)
        binv = jax.vmap(_invert_via_qr)(bmat)
        zn = jnp.where(s.in_basis, 0.0, _nb_value(lb, ub, s.at_upper))
        rhs = -_e_matmul(A, zn)
        xb = jnp.einsum("bmk,bk->bm", binv, rhs)
        keep = (s.status != RUNNING)[:, None]
        return dataclasses.replace(
            s,
            binv=jnp.where(keep[:, :, None], s.binv, binv),
            xb=jnp.where(keep, s.xb, xb),
        )

    st2 = jax.lax.cond(st2.step % REFACTOR_EVERY == 0, refactor,
                       lambda s: s, st2)
    return st2


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _solve_batch_jit(A, c, lb, ub, max_iter):
    st = _initial_state(A, c, lb, ub)

    def cond(s):
        return jnp.any(s.status == RUNNING) & (s.step < max_iter)

    st = jax.lax.while_loop(cond, lambda s: _step(A, c, lb, ub, st=s), st)
    status = jnp.where(st.status == RUNNING, ITLIM, st.status)

    B = c.shape[0]
    M, N = A.shape
    batch = jnp.arange(B)
    z = jnp.where(st.in_basis, 0.0, _nb_value(lb, ub, st.at_upper))
    z = z.at[batch[:, None], st.basis].set(st.xb)
    obj = jnp.sum(c * z, axis=1)
    cB = jnp.take_along_axis(c, st.basis, axis=1)
    y = jnp.einsum("bm,bmk->bk", cB, st.binv)
    d = c - _e_rmatmul(A, y)
    row_dual = -y                  # GLPK sign convention, see module docstring
    col_dual = d[:, M:]
    return status, obj, z[:, M:], z[:, :M], row_dual, col_dual, st.iters


def _bucket(x: int) -> int:
    """Round a dimension up to a standard size so distinct problem shapes
    share compiled executables (dummy rows are free, dummy columns fixed
    at zero, so padding never changes the solution)."""
    if x <= 8:
        return 8
    step = max(8, 1 << (x.bit_length() - 3))
    return -(-x // step) * step


def solve_batch(A, c, row_lb, row_ub, col_lb, col_ub, *,
                max_iter: int | None = None) -> LPResult:
    """Solve a batch of LPs sharing constraint matrix ``A`` (M, N).

    ``c``: (B, N) objective on structural variables.
    ``row_lb``/``row_ub``: (B, M); ``col_lb``/``col_ub``: (B, N).
    """
    A = np.asarray(A, np.float64)
    M, N = A.shape
    c = np.atleast_2d(np.asarray(c, np.float64))
    B = c.shape[0]
    Mp, Np = _bucket(M), _bucket(N)
    if max_iter is None:
        # derived from the PADDED dims so it is as bucketed as the shapes
        max_iter = 50 * (Mp + Np) + 500
    A_p = np.zeros((Mp, Np))
    A_p[:M, :N] = A

    def _pad(arr, k, kp, fill):
        arr = np.asarray(arr, np.float64)
        out = np.full((B, kp), fill)
        out[:, :k] = arr
        return out

    full_c = np.concatenate(
        [np.zeros((B, Mp)), _pad(c, N, Np, 0.0)], axis=1)
    lb = np.concatenate(
        [_pad(row_lb, M, Mp, -np.inf), _pad(col_lb, N, Np, 0.0)], axis=1)
    ub = np.concatenate(
        [_pad(row_ub, M, Mp, np.inf), _pad(col_ub, N, Np, 0.0)], axis=1)

    out = _solve_batch_jit(jnp.asarray(A_p), jnp.asarray(full_c),
                           jnp.asarray(lb), jnp.asarray(ub), max_iter)
    status, obj, x, s, row_dual, col_dual, iters = (np.asarray(o) for o in out)
    return LPResult(status, obj, x[:, :N], s[:, :M],
                    row_dual[:, :M], col_dual[:, :N], iters)

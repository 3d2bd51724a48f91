"""Batched Mehrotra predictor-corrector interior-point LP solver — the
MXU-native backend for HUGE instances (reference ex07/ex09 scale).

Why it exists: every simplex variant here advances one pivot per
XLA while-loop iteration, and on the TPU backend a loop iteration has
a ~0.5-7 ms floor regardless of FLOPs (measured: a trivial 2-op body
runs at ~1850 it/s; the revised step's ~100-op body at ~130-150 it/s
WHATEVER M is).  A cold ex09-scale LP needs 10^4-10^5 pivots — hours.
The reference sidesteps this with GLPK's sparse serial simplex
(bslv_lp.c:219-259); the TPU-native answer is to change the algorithm:
Mehrotra IPM converges in ~15-40 iterations INDEPENDENT of degeneracy,
and each iteration is dominated by two MXU-shaped products —
S = A D A^T (one big matmul) and its Cholesky — exactly what the
hardware is built for.  At ex09 scale (M=4608, N=36939) an iteration
is ~1.6 TFLOP of matmul, i.e. tens of milliseconds, so a cold solve is
seconds instead of hours.

Formulation (matches solve_batch's contract, bslv_lp.c:34-43 bound
types): min c'x  s.t.  row_lb <= A x <= row_ub, col_lb <= x <= col_ub.
Introduce row activities s = A x as variables: z = (x, s), G = [A, -I],
G z = 0, l <= z <= u with infinities allowed.  Finite bounds get
barrier pairs (p = z-l, zl) and (w = u-z, zu); the Newton system
reduces to normal equations

    (A D_x A^T + D_s + reg) dy = rhs,   D = 1/(zl/p + zu/w + reg_p)

with D_j = 0 pinning fixed variables (l == u, e.g. the -Px+y=0
coupling rows' slacks) and free variables handled by the primal
regularizer alone.  Duals: row_dual = y and col_dual = c_x - A^T y,
the same sign convention as simplex._final_solutions (row_dual = -y
there because its row constraint is s - A x = 0).

Statuses: OPTIMAL on convergence; UNBOUNDED / INFEASIBLE via the
standard divergence heuristics (diverging iterate with vanishing
primal residual / stagnating primal residual); ITLIM otherwise.
basis/at_upper are None — an interior solution has no basis, callers
(templates._run) already guard on that.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bensolve_tpu.lp.simplex import (INFEASIBLE, ITLIM, OPTIMAL, UNBOUNDED,
                                     LPResult)

# size gate used by solve_batch_auto: total variable count above which
# the per-pivot while-loop floor beats simplex and the IPM wins
IPM_MIN_SIZE = 2000


def _pow2(x):
    return np.exp2(np.round(np.log2(np.maximum(x, 1e-30))))


@dataclasses.dataclass
class _ScaledIPM:
    A: object
    As: np.ndarray      # (M, N) equilibrated, requested dtype
    r: np.ndarray       # (M,) row scales
    cv: np.ndarray      # (N,) col scales


_CACHE: dict = {}


def _scale(A, dtype) -> _ScaledIPM:
    if hasattr(A, "host"):          # simplex._PreparedA
        A = A.host
    key = (id(A), np.dtype(dtype).str)
    hit = _CACHE.get(key)
    if hit is not None and hit.A is A:
        return hit
    arr = np.asarray(A, np.float64)
    absA = np.abs(arr)
    rmax = absA.max(axis=1)
    # all-zero rows (e.g. the eta row of the phase-0 template, eta = 0)
    # get a NEUTRAL scale: 1/max would be ~2^40, which blows the row's
    # scaled bounds (and with them the starting point's primal
    # residual) up by the same factor
    r = np.where(rmax > 1e-300,
                 np.clip(_pow2(1.0 / np.maximum(rmax, 1e-12)),
                         2.0 ** -30, 2.0 ** 30), 1.0)
    cmax = (absA * r[:, None]).max(axis=0)
    cv = np.where(cmax > 1e-300,
                  np.clip(_pow2(1.0 / np.maximum(cmax, 1e-12)),
                          2.0 ** -30, 2.0 ** 30), 1.0)
    sc = _ScaledIPM(A, (arr * r[:, None] * cv[None, :]).astype(dtype), r, cv)
    if len(_CACHE) > 8:
        _CACHE.clear()
    _CACHE[key] = sc
    return sc


def _params(dtype):
    """(tol, reg_p, reg_d, damping, div_thresh) per dtype.  reg_d is
    RELATIVE to the normal matrix's mean diagonal: S can be
    structurally rank-deficient (every equality row's slack is fixed,
    contributing 0 to the diagonal — ex09 has thousands), and an
    absolute ~1e-10 shift is invisible next to diag entries of ~1e3.
    div_thresh bounds iterate/multiplier norms before an instance is
    declared INFEASIBLE/UNBOUNDED (checked only after a few iterations
    — the first Newton steps of a cold start overshoot transiently)."""
    if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        return 1e-4, 1e-6, 2e-5, 0.99, 1e7
    return 1e-8, 1e-10, 1e-9, 0.9995, 1e9


def _chol_solve(L, b):
    """Solve S x = b from the Cholesky factor L (batched via vmap by
    the caller's shapes: L (M, M), b (M,))."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def _ipm_core(A, c, l, u, max_iter, dtype):
    """One jitted IPM solve over a batch sharing A.  c, l, u: (B, K)
    with K = N + M (x then s).  Returns (z, y, zl, zu, status, iters).
    """
    tol, reg_p, reg_d, damp, div = _params(dtype)
    B, K = c.shape
    M, N = A.shape
    has_l = jnp.isfinite(l)
    has_u = jnp.isfinite(u)
    fixed = has_l & has_u & (u - l <= 0)
    nb = jnp.maximum(has_l.sum(axis=1) + has_u.sum(axis=1), 1)  # (B,)

    def Gz(z):
        x, s = z[:, :N], z[:, N:]
        return x @ A.T - s

    def GTy(y):
        return jnp.concatenate([y @ A, -y], axis=1)

    # start: midpoint of finite bounds, unit barrier slacks
    z0 = jnp.where(fixed, l,
                   jnp.where(has_l & has_u, 0.5 * (l + u),
                             jnp.where(has_l, l + 1.0,
                                       jnp.where(has_u, u - 1.0, 0.0))))
    p0 = jnp.where(has_l & ~fixed, jnp.maximum(z0 - l, 1.0), 1.0)
    w0 = jnp.where(has_u & ~fixed, jnp.maximum(u - z0, 1.0), 1.0)
    zl0 = jnp.where(has_l & ~fixed, 1.0, 0.0).astype(dtype)
    zu0 = jnp.where(has_u & ~fixed, 1.0, 0.0).astype(dtype)
    y0 = jnp.zeros((B, M), dtype)
    status0 = jnp.full(B, -1, jnp.int32)      # -1 = running

    def body(carry):
        z, y, zl, zu, p, w, status, it, mu_prev, noimp = carry
        running = status < 0

        theta = (jnp.where(has_l & ~fixed, zl / p, 0.0)
                 + jnp.where(has_u & ~fixed, zu / w, 0.0) + reg_p)
        D = jnp.where(fixed, 0.0, 1.0 / theta)                  # (B, K)

        r_p = -Gz(z)                                            # (B, M)
        gty = GTy(y)
        r_d = c - gty - zl + zu                                 # (B, K)

        mu = (jnp.sum(jnp.where(has_l & ~fixed, p * zl, 0.0), axis=1)
              + jnp.sum(jnp.where(has_u & ~fixed, w * zu, 0.0), axis=1)
              ) / nb                                            # (B,)

        # normal matrix S = A D_x A^T + D_s + reg_d*I, per instance.
        # lax.map keeps the (M, N) scaled-A temporary single-instance
        # (at ex09 scale a vmapped build would materialize B x 680 MB)
        def build_S(d):
            W = A * jnp.sqrt(d[:N])[None, :]
            S = W @ W.T
            # trace-relative shift: keeps S positive definite through
            # structural rank deficiency (fixed slacks zero whole rows)
            delta = reg_d * (jnp.mean(jnp.diagonal(S)) + 1.0)
            return S + jnp.diag(d[N:] + delta)

        S = jax.lax.map(build_S, D)                             # (B, M, M)
        L = jax.vmap(jnp.linalg.cholesky)(S)
        chol_ok = jnp.all(jnp.isfinite(L[:, -1, :]), axis=1)    # (B,)

        def solve_dir(r_cl, r_cu):
            rhat = (r_d - jnp.where(has_l & ~fixed, r_cl / p, 0.0)
                    + jnp.where(has_u & ~fixed, r_cu / w, 0.0))
            rhs = r_p + Gz(D * rhat)
            dy = jax.vmap(_chol_solve)(L, rhs)
            dz = D * (GTy(dy) - rhat)
            dzl = jnp.where(has_l & ~fixed, (r_cl - zl * dz) / p, 0.0)
            dzu = jnp.where(has_u & ~fixed, (r_cu + zu * dz) / w, 0.0)
            return dy, dz, dzl, dzu

        def steps(dz, dzl, dzu):
            ratio_p = jnp.where(has_l & ~fixed & (dz < 0), -p / dz, jnp.inf)
            ratio_p = jnp.minimum(
                ratio_p,
                jnp.where(has_u & ~fixed & (dz > 0), w / dz, jnp.inf))
            a_p = jnp.minimum(1.0, damp * jnp.min(ratio_p, axis=1))
            ratio_d = jnp.where(dzl < 0, -zl / jnp.minimum(dzl, -1e-30),
                                jnp.inf)
            ratio_d = jnp.minimum(
                ratio_d,
                jnp.where(dzu < 0, -zu / jnp.minimum(dzu, -1e-30), jnp.inf))
            a_d = jnp.minimum(1.0, damp * jnp.min(ratio_d, axis=1))
            return a_p[:, None], a_d[:, None]

        # affine (predictor) direction: r_cl = -p*zl, r_cu = -w*zu
        dy_a, dz_a, dzl_a, dzu_a = solve_dir(-p * zl, -w * zu)
        ap_a, ad_a = steps(dz_a, dzl_a, dzu_a)
        mu_aff = ((jnp.sum(jnp.where(has_l & ~fixed,
                                     (p + ap_a * dz_a) * (zl + ad_a * dzl_a),
                                     0.0), axis=1)
                   + jnp.sum(jnp.where(has_u & ~fixed,
                                       (w - ap_a * dz_a) * (zu + ad_a * dzu_a),
                                       0.0), axis=1)) / nb)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # corrector: centering + Mehrotra second-order term
        sm = (sigma * mu)[:, None]
        r_cl = sm - p * zl - dz_a * dzl_a
        r_cu = sm - w * zu + dz_a * dzu_a
        dy, dz, dzl, dzu = solve_dir(r_cl, r_cu)
        a_p, a_d = steps(dz, dzl, dzu)

        dir_ok = (jnp.all(jnp.isfinite(dz), axis=1)
                  & jnp.all(jnp.isfinite(dy), axis=1))
        upd = (running & chol_ok & dir_ok)[:, None]
        z_n = jnp.where(upd, z + a_p * dz, z)
        y_n = jnp.where(upd, y + a_d * dy, y)
        zl_n = jnp.where(upd, jnp.maximum(zl + a_d * dzl, 0.0), zl)
        zu_n = jnp.where(upd, jnp.maximum(zu + a_d * dzu, 0.0), zu)
        p_n = jnp.where(has_l & ~fixed, z_n - l, 1.0)
        w_n = jnp.where(has_u & ~fixed, u - z_n, 1.0)
        # keep barrier slacks strictly positive (f32 round-off)
        floor = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-8, dtype)
        p_n = jnp.maximum(p_n, floor)
        w_n = jnp.maximum(w_n, floor)

        # convergence / divergence classification on the NEW iterate
        r_p_n = -Gz(z_n)
        r_d_n = c - GTy(y_n) - zl_n + zu_n
        mu_n = ((jnp.sum(jnp.where(has_l & ~fixed, p_n * zl_n, 0.0), axis=1)
                 + jnp.sum(jnp.where(has_u & ~fixed, w_n * zu_n, 0.0),
                           axis=1)) / nb)
        znorm = jnp.max(jnp.abs(z_n), axis=1)
        pinf = jnp.max(jnp.abs(r_p_n), axis=1) / (1.0 + znorm)
        dinf = jnp.max(jnp.where(fixed, 0.0, jnp.abs(r_d_n)), axis=1) / (
            1.0 + jnp.max(jnp.abs(c), axis=1))
        obj = jnp.sum(c * z_n, axis=1)
        # TOTAL complementarity (the actual duality gap), not the
        # per-pair average: nb is in the thousands, and accepting on
        # the average let f32 stop with O(1) objective error
        gap = mu_n * nb / (1.0 + jnp.abs(obj))

        # precision-floor stall: mu no longer shrinking (f32 runs out
        # of digits around gap ~ 1e-5-1e-6); accept if the residuals
        # are respectable — callers at this scale run Benson at
        # eps 1e-2..5e-2
        # Mehrotra convergence is geometric (3-10x mu reduction per
        # iteration); anything below 30%/iter counts as stalling
        improving = mu_n < 0.7 * mu_prev
        noimp_n = jnp.where(improving, 0, noimp + 1)
        stalled = (noimp_n >= 8) & (pinf < 10 * tol) & (dinf < 100 * tol)

        converged = ((pinf < tol) & (dinf < 10 * tol) & (gap < tol)
                     ) | stalled
        # divergence is only trusted once the cold-start transient has
        # settled (the first Newton steps of a feasible problem can
        # overshoot by orders of magnitude before recentering)
        settled = it >= 10
        dual_norm = jnp.maximum(jnp.max(zl_n, axis=1),
                                jnp.max(zu_n, axis=1))
        diverged = settled & ((znorm > div) | (dual_norm > div))
        unbounded = diverged & (pinf < jnp.sqrt(tol))
        infeasible = diverged & ~unbounded
        bad_step = settled & ~(chol_ok & dir_ok)
        status_n = jnp.where(
            running & converged, OPTIMAL,
            jnp.where(running & unbounded, UNBOUNDED,
                      jnp.where(running & infeasible, INFEASIBLE,
                                jnp.where(running & bad_step, ITLIM,
                                          status))))
        it_n = it + running.astype(jnp.int32)
        return (z_n, y_n, zl_n, zu_n, p_n, w_n, status_n, it_n, mu_n,
                noimp_n)

    def cond(carry):
        status, it = carry[6], carry[7]
        return jnp.any(status < 0) & jnp.all(it < max_iter)

    init = (z0, y0, zl0, zu0, p0, w0, status0,
            jnp.zeros(B, jnp.int32), jnp.ones(B, dtype),
            jnp.zeros(B, jnp.int32))
    (z, y, zl, zu, p, w, status, it, mu,
     _noimp) = jax.lax.while_loop(cond, body, init)

    # post-loop classification of still-running instances: an
    # infeasible LP shows a stagnating primal residual with exploding
    # bound multipliers; an unbounded one a diverging primal iterate
    # with a clean primal residual
    r_p = -Gz(z)
    znorm = jnp.max(jnp.abs(z), axis=1)
    pinf = jnp.max(jnp.abs(r_p), axis=1) / (1.0 + znorm)
    dual_norm = jnp.maximum(jnp.max(zl, axis=1), jnp.max(zu, axis=1))
    tail = jnp.where(
        (pinf > jnp.sqrt(tol)) | (dual_norm > div), INFEASIBLE,
        jnp.where((znorm > 0.01 * div) & (pinf < jnp.sqrt(tol)),
                  UNBOUNDED, ITLIM))
    status = jnp.where(status < 0, tail, status)
    return z, y, zl, zu, status, it


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _ipm_jit(A, c, l, u, max_iter):
    return _ipm_core(A, c, l, u, max_iter, c.dtype)


def solve_batch_ipm(A, c, row_lb, row_ub, col_lb, col_ub, *,
                    max_iter: int = 120, dtype=np.float32,
                    verbose: int = 0, **_ignored) -> LPResult:
    """solve_batch-compatible entry (basis/at_upper come back None).
    Extra keyword arguments accepted by the simplex backends
    (start_basis, max_chunk, ...) are ignored — an IPM neither consumes
    nor produces a basis."""
    dtype = np.dtype(dtype).type
    sc = _scale(A, dtype)
    M, N = sc.As.shape
    c2 = np.atleast_2d(np.asarray(c))
    B = c2.shape[0]
    r, cv = sc.r, sc.cv

    # scaled problem: x' = x / cv, s' = r * s
    cx = c2 * cv[None, :]
    lx = np.asarray(col_lb) / cv[None, :]
    ux = np.asarray(col_ub) / cv[None, :]

    # FREE columns (both bounds infinite across the whole batch — the
    # y/z variables of the Benson templates) are split x = x+ - x-
    # with both parts in [0, inf).  Without the split a free column
    # only carries the tiny regularizer, its barrier weight D = 1/reg_p
    # explodes, and the f32 normal matrix A D A^T loses all its digits
    # (observed: first-iteration duals ~1e34 at ex09 scale).
    free_col = np.flatnonzero(
        (~np.isfinite(lx)).all(axis=0) & (~np.isfinite(ux)).all(axis=0))
    nf = free_col.size
    As = sc.As
    if nf:
        As = np.concatenate([As, -As[:, free_col]], axis=1)
        cx = np.concatenate([cx, -cx[:, free_col]], axis=1)
        lx = np.concatenate([lx, np.zeros((B, nf))], axis=1)
        lx[:, free_col] = 0.0
        ux = np.concatenate([ux, np.full((B, nf), np.inf)], axis=1)

    c_s = np.concatenate([cx, np.zeros((B, M))], axis=1)
    l_s = np.concatenate([lx, np.asarray(row_lb) * r[None, :]], axis=1)
    u_s = np.concatenate([ux, np.asarray(row_ub) * r[None, :]], axis=1)
    crossed = (l_s > u_s).any(axis=1)
    l_s = np.minimum(l_s, u_s)

    z, y, zl, zu, status, iters = _ipm_jit(
        jnp.asarray(As), jnp.asarray(c_s, dtype),
        jnp.asarray(l_s, dtype), jnp.asarray(u_s, dtype), max_iter)
    z = np.asarray(z, np.float64)
    y = np.asarray(y, np.float64)
    status = np.asarray(status).copy()
    iters = np.asarray(iters)

    xs = z[:, :N]
    if nf:
        xs = xs.copy()
        xs[:, free_col] -= z[:, N:N + nf]
    x = xs * cv[None, :]
    s = z[:, N + nf:] / r[None, :]
    row_dual = y * r[None, :]
    # stationarity under the simplex sign convention, by construction
    col_dual = c2 - row_dual @ np.asarray(
        A.host if hasattr(A, "host") else A, np.float64)
    obj = np.einsum("bn,bn->b", c2, x)
    status[crossed] = INFEASIBLE
    if verbose >= 2:
        counts = dict(zip(*np.unique(status, return_counts=True)))
        print(f"lp_solve[ipm]: batch={B} statuses={counts} "
              f"iters max={int(iters.max())}", flush=True)
    return LPResult(status, obj, x, s, row_dual, col_dual,
                    iters, None, None)

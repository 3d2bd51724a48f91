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
import os
import time as _time

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


def _ipm_init_core(c, l, u, dtype):
    """Initial carry: midpoint start with EXACT barrier distances.
    (Flooring p0/w0 at 1.0 while the true distance is smaller let the
    first step's ratio test push iterates OUTSIDE narrow boxes — and
    with no bound-feasibility term in the convergence test, an
    infeasible LP could then converge to a false OPTIMAL.)"""
    B, K = c.shape
    has_l = jnp.isfinite(l)
    has_u = jnp.isfinite(u)
    fixed = has_l & has_u & (u - l <= 0)
    z0 = jnp.where(fixed, l,
                   jnp.where(has_l & has_u, 0.5 * (l + u),
                             jnp.where(has_l, l + 1.0,
                                       jnp.where(has_u, u - 1.0, 0.0))))
    p0 = jnp.where(has_l & ~fixed, jnp.maximum(z0 - l, 1e-12), 1.0)
    w0 = jnp.where(has_u & ~fixed, jnp.maximum(u - z0, 1e-12), 1.0)
    zl0 = jnp.where(has_l & ~fixed, 1.0, 0.0).astype(dtype)
    zu0 = jnp.where(has_u & ~fixed, 1.0, 0.0).astype(dtype)
    return (z0, p0, w0, zl0, zu0)


@functools.partial(jax.jit, static_argnames=("M",))
def _ipm_init_jit(c, l, u, M):
    dtype = c.dtype
    B, K = c.shape
    z0, p0, w0, zl0, zu0 = _ipm_init_core(c, l, u, dtype)
    y0 = jnp.zeros((B, M), dtype)
    status0 = jnp.full(B, -1, jnp.int32)
    return (z0, y0, zl0, zu0, p0, w0, status0,
            jnp.zeros(B, jnp.int32), jnp.ones(B, dtype),
            jnp.zeros(B, jnp.int32),
            z0, y0, zl0, zu0, jnp.full(B, jnp.inf, dtype),
            jnp.zeros(B, jnp.int32))


# Warm-start interiorization (Gondzio-style): how far inside the box
# the carried primal point is pushed, and the centered barrier level
# the multipliers restart at.  Benson re-solves differ only in a few
# extra-row bounds, so the previous round's converged point is a few
# steps from the new central path — but starting ON the boundary stalls
# Mehrotra, hence the shift.
WARM_MARGIN = 1e-3
WARM_MU0 = 1e-3


@functools.partial(jax.jit, static_argnames=("M",))
def _ipm_warm_init_jit(c, l, u, z0, y0, M):
    """Initial carry from a carried interior point (z0, y0) in the
    SCALED space: primal pushed WARM_MARGIN inside every finite bound;
    bound multipliers set to WARM_MU0 / distance so every barrier pair
    starts exactly centered at mu = WARM_MU0 — two decades below the
    cold start's mu ~ 1.  Rows of z0 containing non-finite values are
    COLD-started instead (the _FacetWarm NaN marker for candidates
    without a parent — a borrowed foreign point measurably hurts).
    The TPU-native analogue of GLPK's carried basis (bslv_lp.c:31) for
    the IPM route."""
    dtype = c.dtype
    B, K = c.shape
    has_l = jnp.isfinite(l)
    has_u = jnp.isfinite(u)
    fixed = has_l & has_u & (u - l <= 0)
    row_ok = (jnp.all(jnp.isfinite(z0), axis=1)
              & jnp.all(jnp.isfinite(y0), axis=1))      # (B,)
    zc0, pc0, wc0, zlc0, zuc0 = _ipm_init_core(c, l, u, dtype)
    z0 = jnp.where(row_ok[:, None], z0, zc0)
    y0 = jnp.where(row_ok[:, None], y0, 0.0)
    narrow = has_l & has_u & ~fixed & (u - l < 2.5 * WARM_MARGIN)
    z = jnp.where(has_l, jnp.maximum(z0, l + WARM_MARGIN), z0)
    z = jnp.where(has_u, jnp.minimum(z, u - WARM_MARGIN), z)
    z = jnp.where(narrow, 0.5 * (l + u), jnp.where(fixed, l, z))
    z = jnp.where(row_ok[:, None], z, zc0)
    p0 = jnp.where(has_l & ~fixed, jnp.maximum(z - l, 1e-8), 1.0)
    w0 = jnp.where(has_u & ~fixed, jnp.maximum(u - z, 1e-8), 1.0)
    zl0 = jnp.where(has_l & ~fixed, WARM_MU0 / p0, 0.0).astype(dtype)
    zu0 = jnp.where(has_u & ~fixed, WARM_MU0 / w0, 0.0).astype(dtype)
    p0 = jnp.where(row_ok[:, None], p0, pc0)
    w0 = jnp.where(row_ok[:, None], w0, wc0)
    zl0 = jnp.where(row_ok[:, None], zl0, zlc0)
    zu0 = jnp.where(row_ok[:, None], zu0, zuc0)
    status0 = jnp.full(B, -1, jnp.int32)
    mu0 = jnp.where(row_ok, WARM_MU0, 1.0).astype(dtype)
    return (z, y0, zl0, zu0, p0, w0, status0,
            jnp.zeros(B, jnp.int32), mu0,
            jnp.zeros(B, jnp.int32),
            z, y0, zl0, zu0, jnp.full(B, jnp.inf, dtype),
            jnp.zeros(B, jnp.int32))


def _ipm_core(A, c, l, u, split, carry0, seg, max_iter, dtype):
    """Advance the IPM by at most ``seg`` iterations from ``carry0``.
    c, l, u: (B, K) with K = N + M (x then s).  ``split``: (nf, 2)
    int32 column-index pairs of free-variable splits x = x+ - x- (both
    halves in [0, inf)); after each step the pair's common mode
    min(x+, x-) is pulled back toward 1 — the two columns of A are
    exact negatives, so the shift changes no residual, and without it
    the pair drifts to +inf along the null direction and trips the
    divergence detector.  SEGMENTED execution (the revised backend's
    pattern): one multi-minute device program trips remote-runtime
    watchdogs — observed: the ex09 phase-1 round crashed the TPU
    worker — so the host re-invokes this in seg-sized slices and gets
    progress observability for free.  status -1 = still running;
    classification is the Python caller's job."""
    tol, reg_p, reg_d, damp, div = _params(dtype)
    B, K = c.shape
    M, N = A.shape
    has_l = jnp.isfinite(l)
    has_u = jnp.isfinite(u)
    fixed = has_l & has_u & (u - l <= 0)
    nb = jnp.maximum(has_l.sum(axis=1) + has_u.sum(axis=1), 1)  # (B,)
    # On TPU an f32 matmul runs at bf16 input precision by default
    # (~8 mantissa bits) — the normal matrix then floors the Newton
    # accuracy around 1e-3 and f32 solves ITLIM-stall at scale.
    # Default to bf16x3 passes ("high", ~f32-grade dot products at
    # +50% matmul cost — measured 53 ms vs 36 ms per ex09-scale S
    # build); BENSOLVE_IPM_PRECISION overrides (default|high|highest).
    prec = {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[
        os.environ.get("BENSOLVE_IPM_PRECISION", "high")]

    def Gz(z):
        x, s = z[:, :N], z[:, N:]
        return jnp.matmul(x, A.T, precision=prec) - s

    def GTy(y):
        return jnp.concatenate([jnp.matmul(y, A, precision=prec), -y],
                               axis=1)

    def body(carry):
        z, y, zl, zu, p, w, status, it, mu_prev, noimp = carry[:10]
        resets = carry[15]
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
            S = jnp.matmul(W, W.T, precision=prec)
            # trace-relative shift: keeps S positive definite through
            # structural rank deficiency (fixed slacks zero whole rows)
            delta = reg_d * (jnp.mean(jnp.diagonal(S)) + 1.0)
            return S + jnp.diag(d[N:] + delta), delta

        S, delta = jax.lax.map(build_S, D)                      # (B, M, M)
        L = jax.vmap(jnp.linalg.cholesky)(S)
        chol_ok = jnp.all(jnp.isfinite(L[:, -1, :]), axis=1)    # (B,)

        def _retry_chol(args):
            # one modest (1e4x) regularization boost: near convergence
            # the barrier weights spread over ~12 decades and the f32
            # factorization can go NaN (observed at ex09 scale,
            # iteration 11 of a cleanly converging run).  A stronger
            # boost is counterproductive — the mega-damped steps stop
            # tracking the central path and the iterate drifts (probe:
            # pinf grew from 1e-3 to 0.5); instances that still fail
            # are salvage-accepted or ITLIMed below instead.
            L, S, ok = args
            eye = jnp.eye(M, dtype=S.dtype)
            S_b = S + (1e4 * delta)[:, None, None] * eye[None]
            L_b = jax.vmap(jnp.linalg.cholesky)(S_b)
            ok_b = jnp.all(jnp.isfinite(L_b[:, -1, :]), axis=1)
            take = (~ok & ok_b)[:, None, None]
            return jnp.where(take, L_b, L), S, ok | ok_b

        L, _, chol_ok = jax.lax.cond(
            jnp.all(chol_ok), lambda a: a, _retry_chol, (L, S, chol_ok))

        def solve_S(rhs):
            # Cholesky solve + iterative refinement.  The TPU
            # triangular solve is blocked-inverse-based (not backward
            # stable like LAPACK): without refinement the Newton
            # direction degrades as the barrier spreads S's spectrum,
            # and the primal residual GROWS from ~1e-3 to 0.5 over the
            # late iterations at ex09 scale while the same f32 math
            # converges on CPU.  Residuals are computed at HIGHEST
            # (full-f32) matmul precision; an f64-emulated residual was
            # tried and made things WORSE on the tunnel backend (its
            # emulated f64 einsum is unreliable — same reason
            # lp/linalg.py carries a custom f64 LU).
            x = jax.vmap(_chol_solve)(L, rhs)
            for _ in range(2):
                resid = rhs - jnp.einsum(
                    "bmn,bn->bm", S, x,
                    precision=jax.lax.Precision.HIGHEST)
                x = x + jax.vmap(_chol_solve)(L, resid)
            return x

        def solve_dir(r_cl, r_cu):
            rhat = (r_d - jnp.where(has_l & ~fixed, r_cl / p, 0.0)
                    + jnp.where(has_u & ~fixed, r_cu / w, 0.0))
            rhs = r_p + Gz(D * rhat)
            dy = solve_S(rhs)
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
        if split.shape[0]:
            # recenter free-split pairs: subtract the common mode above
            # 1.0 from both halves (columns are exact negatives, so Gz
            # and c'z are unchanged; x = x+ - x- is preserved)
            zp, zm = z_n[:, split[:, 0]], z_n[:, split[:, 1]]
            shift = jnp.maximum(jnp.minimum(zp, zm) - 1.0, 0.0)
            z_n = z_n.at[:, split[:, 0]].add(-shift)
            z_n = z_n.at[:, split[:, 1]].add(-shift)
        y_n = jnp.where(upd, y + a_d * dy, y)
        zl_n = jnp.where(upd, jnp.maximum(zl + a_d * dzl, 0.0), zl)
        zu_n = jnp.where(upd, jnp.maximum(zu + a_d * dzu, 0.0), zu)
        # hard projection into the box: the damped ratio test keeps
        # iterates interior up to round-off; the clip makes the
        # z <-> (p, w) invariant exact so bound feasibility can never
        # silently drift (false-OPTIMAL-on-infeasible guard)
        z_n = jnp.where(fixed, l, jnp.clip(z_n, l, u))
        p_n = jnp.where(has_l & ~fixed, z_n - l, 1.0)
        w_n = jnp.where(has_u & ~fixed, u - z_n, 1.0)
        # keep barrier slacks strictly positive (f32 round-off)
        floor = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-8, dtype)
        p_n = jnp.maximum(p_n, floor)
        w_n = jnp.maximum(w_n, floor)

        # convergence / divergence classification on the NEW iterate
        # (NOTE: no step-quality clamping here — the f32 endgame takes
        # deliberate feasibility EXCURSIONS (observed pinf 1e-3 -> 0.4
        # -> 6e-6 over four iterations at ex09 scale) and a revert
        # rule froze otherwise-convergent runs)
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
        # best-iterate tracking BEFORE any restart below: on a restart
        # iteration the freshly reset multipliers must not be stored
        # under the pre-restart score (that corrupted the best state —
        # observed dinf jumping to 2e2 on the substituted iterate).
        # Budget-exhausted instances are classified from the best KKT
        # score seen, not whatever the last segment left behind.
        zb, yb, zlb, zub, score_b = carry[10:15]
        score = jnp.maximum(jnp.maximum(pinf, dinf), gap)
        better = (running & (score < score_b))[:, None]
        zb = jnp.where(better, z_n, zb)
        yb = jnp.where(better, y_n, yb)
        zlb = jnp.where(better, zl_n, zlb)
        zub = jnp.where(better, zu_n, zub)
        score_b = jnp.minimum(score_b, jnp.where(
            running, score, jnp.inf))

        improving = mu_n < 0.7 * mu_prev
        noimp_n = jnp.where(improving, 0, noimp + 1)
        # barrier restart on persistent stall: if mu stopped shrinking
        # for 16 iterations and the residuals are NOT loose-acceptable,
        # reset the bound multipliers to the cold start (keeping the
        # primal iterate and y) — a fresh central-path trajectory from
        # the current point escapes f32 corners that small steps
        # cannot (the GLPK glp_std_basis retry analogue for the IPM).
        # From the THIRD restart on, also re-center the PRIMAL iterate
        # toward the box midpoint for trajectory diversity — repeated
        # multiplier-only restarts from the same corner walk back into
        # it.  (Count-based, not iteration-based: the host's best-score
        # stall stop terminates hard instances around iteration ~200,
        # so an it >= max_iter/2 gate would never fire.)
        restart = (running & (noimp_n >= 16) & (pinf >= 10 * tol))
        zl_n = jnp.where(restart[:, None] & has_l & ~fixed, 1.0, zl_n)
        zu_n = jnp.where(restart[:, None] & has_u & ~fixed, 1.0, zu_n)
        full_restart = restart & (resets >= 2)
        resets_n = resets + restart.astype(jnp.int32)
        mid = jnp.where(fixed, l,
                        jnp.where(has_l & has_u, 0.5 * (l + u),
                                  jnp.where(has_l, l + 1.0,
                                            jnp.where(has_u, u - 1.0,
                                                      0.0))))
        z_half = 0.5 * (z_n + mid)
        z_n = jnp.where(full_restart[:, None], z_half, z_n)
        p_n = jnp.where(full_restart[:, None] & has_l & ~fixed,
                        jnp.maximum(z_n - l, floor), p_n)
        w_n = jnp.where(full_restart[:, None] & has_u & ~fixed,
                        jnp.maximum(u - z_n, floor), w_n)
        noimp_n = jnp.where(restart, 0, noimp_n)
        mu_n = jnp.where(restart, 1.0, mu_n)
        # stall acceptance must bound the duality gap too — residuals
        # alone let a stalled solve return OPTIMAL with an arbitrarily
        # large objective error (round-3 advisor finding)
        # drift guard: a slowly diverging (unbounded/infeasible)
        # instance can keep residuals modest while the iterate or the
        # multipliers walk off — loose acceptances require both to be
        # far from the divergence threshold (observed: an unbounded
        # row-subsampled ex09 seed stall-accepted at obj -3466)
        no_drift = (znorm < 1e-3 * div) & (jnp.maximum(
            jnp.max(zl_n, axis=1), jnp.max(zu_n, axis=1)) < 1e-3 * div)
        stalled = ((noimp_n >= 8) & (pinf < 10 * tol) & (dinf < 100 * tol)
                   & (gap < 100 * tol) & no_drift)

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
        # factorization/direction failure: the instance cannot advance
        # (its iterate was NOT updated this step).  Near convergence
        # that is the f32 endgame — salvage-accept the pre-failure
        # iterate when its KKT residuals are already at the loose
        # (100x) thresholds, else give up with ITLIM
        bad_step = settled & ~(chol_ok & dir_ok)
        salvage = ((pinf < 100 * tol) & (dinf < 100 * tol)
                   & (gap < 100 * tol) & no_drift)
        status_n = jnp.where(
            running & converged, OPTIMAL,
            jnp.where(running & unbounded, UNBOUNDED,
                      jnp.where(running & infeasible, INFEASIBLE,
                                jnp.where(running & bad_step,
                                          jnp.where(salvage, OPTIMAL,
                                                    ITLIM),
                                          status))))
        it_n = it + running.astype(jnp.int32)
        carry_n = (z_n, y_n, zl_n, zu_n, p_n, w_n, status_n, it_n, mu_n,
                   noimp_n, zb, yb, zlb, zub, score_b, resets_n)
        if trace_on:
            # per-iteration history of instance 0 written into a
            # carried buffer (static env gate BENSOLVE_IPM_TRACE=1) —
            # host callbacks are unavailable on the axon tunnel
            # backend, so the trace must ride the loop state
            hist = carry[16]
            row = jnp.stack([mu_n[0], pinf[0], dinf[0], gap[0],
                             a_p[0, 0], a_d[0, 0], sigma[0]])
            idx = jnp.minimum(it[0], hist.shape[0] - 1).astype(jnp.int32)
            hist = jax.lax.dynamic_update_slice(
                hist, row.astype(hist.dtype)[None, :],
                (idx, jnp.int32(0)))
            carry_n = carry_n + (hist,)
        return carry_n

    trace_on = os.environ.get("BENSOLVE_IPM_TRACE") == "1"

    def cond2(kc):
        k, carry = kc
        status, it = carry[6], carry[7]
        return ((k < seg) & jnp.any(status < 0)
                & jnp.all(it < max_iter))

    def body2(kc):
        k, carry = kc
        return (k + 1, body(carry))

    _, out = jax.lax.while_loop(cond2, body2,
                                (jnp.int32(0), carry0))
    return out


@functools.partial(jax.jit, static_argnames=("seg", "max_iter"))
def _ipm_seg_jit(A, c, l, u, split, carry, seg, max_iter):
    return _ipm_core(A, c, l, u, split, carry, seg, max_iter, c.dtype)


def _polish_one(As, z, y, zl, zu, l, u, c_s, max_rounds: int = 24):
    """Crossover-lite polish of one instance in the SCALED space: pin
    the active set read off the final iterate, least-squares-correct
    the free primal variables onto G z = 0 and the duals onto zero
    reduced cost for free columns (the 'refinement to basic-solution
    accuracy' the IPM lacks — its regularized normal equations floor
    the primal residual around 1e-4..1e-6 while complementarity
    collapses to 1e-13).  The initial pinning can be slightly wrong on
    degenerate instances (observed: 41 of 64 pinned leaves |F| < M and
    the residual unreachable), so the active set is repaired
    adaptively: unpin the most marginal bounds while the primal
    residual is stuck, unpin sign-violating duals, pin free columns
    whose reduced cost is clearly nonzero.  Returns (z', y', ok); on
    ok=False the caller keeps the raw iterate and status logic."""
    M, Nc = As.shape
    has_l = np.isfinite(l)
    has_u = np.isfinite(u)
    fixed = has_l & has_u & (u - l <= 0)
    dist_l = np.maximum(z - l, 1e-300)
    dist_u = np.maximum(u - z, 1e-300)
    at_lb = ~fixed & has_l & (zl / dist_l >= zu / dist_u) & (zl > dist_l)
    at_ub = ~fixed & has_u & ~at_lb & (zu > dist_u)
    # marginality of a pinned bound = its multiplier size (a variable
    # exactly at its bound has dist ~ 0, so a multiplier/distance ratio
    # is useless as a tie-breaker)
    marg = np.where(at_lb, zl, zu)
    dtol = 1e-6 * (1.0 + np.abs(c_s).max())

    used = 0
    for used in range(1, max_rounds + 1):
        pinned = fixed | at_lb | at_ub
        F = np.flatnonzero(~pinned)
        if F.size == 0 or F.size > 6 * M + 16:
            return z, y, False, used
        zp = z.copy()
        zp[fixed | at_lb] = l[fixed | at_lb]
        zp[at_ub] = u[at_ub]

        # G = [As, -I]; free-column block
        GF = np.zeros((M, F.size))
        GF[:, F < Nc] = As[:, F[F < Nc]]
        slack = np.flatnonzero(F >= Nc)
        GF[F[slack] - Nc, slack] = -1.0

        act = zp[:Nc] @ As.T - zp[Nc:]
        d, *_ = np.linalg.lstsq(GF, -act, rcond=None)
        zp[F] += d
        act = zp[:Nc] @ As.T - zp[Nc:]
        scale_z = 1.0 + np.abs(zp).max()
        if not np.isfinite(scale_z):
            return z, y, False, used
        if np.abs(act).max() > 1e-8 * scale_z:
            # residual unreachable from this free set: unpin the single
            # most weakly pinned bound (smallest multiplier) — one at a
            # time; unpinning several overshoots |F| past M and turns
            # the dual fit overdetermined
            cand = np.flatnonzero(at_lb | at_ub)
            if cand.size == 0:
                return z, y, False, used
            k = cand[np.argmin(marg[cand])]
            at_lb[k] = False
            at_ub[k] = False
            continue
        btol = 1e-7 * scale_z
        viol_l = has_l & ~pinned & (zp < l - btol)
        viol_u = has_u & ~pinned & (zp > u + btol)
        if viol_l.any() or viol_u.any():
            at_lb[viol_l & ~fixed] = True
            at_ub[viol_u & ~fixed & ~viol_l] = True
            continue

        e, *_ = np.linalg.lstsq(GF.T, c_s[F] - GF.T @ y, rcond=None)
        yp = y + e
        rd = c_s - np.concatenate([yp @ As, -yp])
        bad_lb = at_lb & (rd < -dtol)
        bad_ub = at_ub & (rd > dtol)
        bad_f = ~pinned & (np.abs(rd) > dtol)
        if not (bad_lb.any() or bad_ub.any() or bad_f.any()):
            return zp, yp, True, used
        if bad_lb.any() or bad_ub.any():
            at_lb[bad_lb] = False
            at_ub[bad_ub] = False
            continue
        # free columns with clearly nonzero reduced cost belong at a
        # bound (positive rd -> lower, negative -> upper).  When
        # |F| > M the dual fit is overdetermined and EVERY free column
        # shows spread-out residuals — pin only the worst offenders,
        # at most enough to bring |F| down to M
        n_pin = max(1, F.size - M)
        order = np.flatnonzero(bad_f)[np.argsort(-np.abs(rd[bad_f]))]
        n_done = 0
        for j in order:
            if n_done >= n_pin:
                break
            if rd[j] > 0 and has_l[j]:
                at_lb[j] = True
                n_done += 1
            elif rd[j] < 0 and has_u[j]:
                at_ub[j] = True
                n_done += 1
        if n_done == 0:
            return z, y, False, used
    return z, y, False, used


def _loose_kkt_ok(As, z, y, zl, zu, l, u, c_s, tol) -> bool:
    """Best-effort acceptance test for budget-exhausted instances: the
    full KKT system within 250x of the dtype tolerance (relative
    primal/dual residuals, bound feasibility, total complementarity).
    Acceptances here are surfaced as LPResult.quality == 2."""
    M, Nc = As.shape
    act = z[:Nc] @ As.T - z[Nc:]
    znorm = np.abs(z).max()
    if not np.isfinite(znorm):
        return False
    pinf = np.abs(act).max() / (1.0 + znorm)
    rd = c_s - np.concatenate([y @ As, -y]) - zl + zu
    fixed = np.isfinite(l) & np.isfinite(u) & (u - l <= 0)
    dinf = np.abs(np.where(fixed, 0.0, rd)).max() / (
        1.0 + np.abs(c_s).max())
    has_l = np.isfinite(l) & ~fixed
    has_u = np.isfinite(u) & ~fixed
    binf = max(np.where(has_l, l - z, -np.inf).max(),
               np.where(has_u, z - u, -np.inf).max(), 0.0) / (1.0 + znorm)
    with np.errstate(invalid="ignore"):
        comp = (np.where(has_l, np.maximum(z - l, 0.0) * zl, 0.0).sum()
                + np.where(has_u, np.maximum(u - z, 0.0) * zu, 0.0).sum())
    obj = float(c_s @ z)
    gap = comp / (1.0 + abs(obj))
    # 250x the dtype tolerance: the hardest ex09 phase-1 LPs exhaust
    # the budget with best-iterate KKT scores just above 100x (pinf
    # 9e-3, dinf 1.3e-2 at tol 1e-4); the end-to-end support oracle
    # (tol 1e-2) remains the arbiter of whether such cuts are usable
    lim = 250 * tol
    return (pinf < lim) and (dinf < lim) and (binf < lim) and (gap < lim)


_SPARSE_CACHE: dict = {}


def _host_highs_one(A_csr, ci, rlb, rub, clb, cub):
    """Exact host-side solve of ONE straggler LP via scipy/HiGHS on the
    SPARSE original matrix — the terminal fallback that restores the
    reference's GLPK-exactness contract (bslv_lp.c:219-259) at every
    scale.  ex09's matrix is 0.1% dense (nz=185856 of 4608x36939,
    SURVEY.md section 6): sparse HiGHS solves one such LP in seconds
    where every dense device method is FLOP- or pivot-bound.  Returns
    (status, obj, x, s, row_dual, col_dual) in solve_batch's dual sign
    convention: c = A' row_dual + col_dual."""
    import scipy.sparse as sp
    from scipy.optimize import linprog

    M = A_csr.shape[0]
    eq = np.isfinite(rlb) & np.isfinite(rub) & (rlb == rub)
    ubm = np.isfinite(rub) & ~eq
    lbm = np.isfinite(rlb) & ~eq
    blocks = []
    if ubm.any():
        blocks.append(A_csr[ubm])
    if lbm.any():
        blocks.append(-A_csr[lbm])
    A_ub = sp.vstack(blocks, format="csr") if blocks else None
    b_ub = np.concatenate([rub[ubm], -rlb[lbm]])
    kw = {}
    if A_ub is not None:
        kw["A_ub"], kw["b_ub"] = A_ub, b_ub
    if eq.any():
        kw["A_eq"], kw["b_eq"] = A_csr[eq], rub[eq]
    res = linprog(ci, bounds=list(zip(clb, cub)), method="highs", **kw)
    smap = {0: OPTIMAL, 2: INFEASIBLE, 3: UNBOUNDED}
    st = smap.get(res.status, ITLIM)
    if st != OPTIMAL:
        N = A_csr.shape[1]
        return (st, 0.0, np.zeros(N), np.zeros(M), np.zeros(M),
                np.zeros(N))
    row_dual = np.zeros(M)
    if A_ub is not None:
        m_in = np.asarray(res.ineqlin.marginals)
        n_ub = int(ubm.sum())
        row_dual[ubm] += m_in[:n_ub]
        row_dual[lbm] -= m_in[n_ub:]
    if eq.any():
        row_dual[eq] = np.asarray(res.eqlin.marginals)
    x = np.asarray(res.x)
    s = A_csr @ x
    col_dual = np.asarray(ci) - A_csr.T @ row_dual
    return st, float(res.fun), x, s, row_dual, col_dual


def _sparse_A(A):
    """CSR of the ORIGINAL (unscaled, unpadded) constraint matrix,
    memoized by identity."""
    import scipy.sparse as sp

    base = A.A if hasattr(A, "A") and not isinstance(A, np.ndarray) else A
    base = np.asarray(base, np.float64)
    key = id(base)
    hit = _SPARSE_CACHE.get(key)
    if hit is not None and hit[0] is base:
        return hit[1]
    csr = sp.csr_matrix(base)
    if len(_SPARSE_CACHE) > 8:
        _SPARSE_CACHE.clear()
    _SPARSE_CACHE[key] = (base, csr)
    return csr


def _farkas_infeasible(As, y, l, u) -> bool:
    """Infeasibility certificate for {G z = 0, l <= z <= u} from the
    final dual iterate: with g = G'y, the box-minimum of y'Gz is
    sum_j [g_j>0] g_j l_j + [g_j<0] g_j u_j; strictly positive (and
    finite) proves the box and the nullspace constraint incompatible.
    Guards the heuristic INFEASIBLE statuses — a wrong one corrupts
    phase-2 seeding (bslv_algs.c:991-999 semantics)."""
    ynorm = np.abs(y).max()
    if not np.isfinite(ynorm) or ynorm == 0:
        return False
    fin = np.concatenate([l[np.isfinite(l)], u[np.isfinite(u)], [0.0]])
    thresh = 1e-6 * (1.0 + np.abs(fin).max())
    for sign in (1.0, -1.0):
        yh = sign * y / ynorm
        g = np.concatenate([yh @ As, -yh])
        lo = np.where(g > 0, l, np.where(g < 0, u, 0.0))
        terms = np.where(g != 0, g * lo, 0.0)
        if np.isfinite(terms).all() and terms.sum() > thresh:
            return True
    return False


def _unbounded_ray(As, z, c_s, l, u) -> bool:
    """Ray certificate from a diverging iterate: d = z/|z| must be an
    approximate recession direction (G d ~ 0, feasible signs against
    the finite bounds) that improves the objective."""
    znorm = np.abs(z).max()
    if not np.isfinite(znorm) or znorm == 0:
        return False
    d = z / znorm
    Nc = As.shape[1]
    if np.abs(d[:Nc] @ As.T - d[Nc:]).max() > 1e-4:
        return False
    if ((np.isfinite(l) & (d < -1e-4)) | (np.isfinite(u)
                                          & (d > 1e-4))).any():
        return False
    return c_s @ d < -1e-6


def solve_batch_ipm(A, c, row_lb, row_ub, col_lb, col_ub, *,
                    max_iter: int = 800, dtype=np.float32,
                    verbose: int = 0, polish: bool | None = None,
                    max_chunk: int | None = None,
                    warm_interior=None, _rescue: bool = False,
                    **_ignored) -> LPResult:
    """solve_batch-compatible entry (basis/at_upper come back None).
    Extra keyword arguments accepted by the simplex backends
    (start_basis, ...) are ignored — an IPM neither consumes nor
    produces a basis.  ``warm_interior``: an (x, s, row_dual) triple
    from a related previous solve (e.g. the prior Benson round's
    converged LP, templates._run) used as a shifted interior start —
    the IPM's analogue of the reference's carried basis
    (bslv_lp.c:31); BENSOLVE_IPM_WARM=0 disables.  The batch is
    chunked against an HBM budget (the per-instance normal matrix +
    factor is 2*M*M*itemsize; BENSOLVE_IPM_BYTES overrides)."""
    dtype = np.dtype(dtype).type
    # BENSOLVE_IPM_MAXIT: budget override.  With the exact host
    # fallback on (default), a SHORT device pass that catches the
    # easy majority plus host HiGHS for the rest beats a long device
    # grind: measured on ex09 round 5, HiGHS resolves a straggler in
    # ~1.5 s while the device needs minutes of restart-heavy f32 work.
    max_iter = int(os.environ.get("BENSOLVE_IPM_MAXIT", max_iter))
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
    split = (np.stack([free_col.astype(np.int32),
                       np.arange(N, N + nf, dtype=np.int32)], axis=1)
             if nf else np.zeros((0, 2), np.int32))

    c_s = np.concatenate([cx, np.zeros((B, M))], axis=1)
    l_s = np.concatenate([lx, np.asarray(row_lb) * r[None, :]], axis=1)
    u_s = np.concatenate([ux, np.asarray(row_ub) * r[None, :]], axis=1)
    crossed = (l_s > u_s).any(axis=1)
    l_s = np.minimum(l_s, u_s)

    # batch chunking against an HBM budget: per instance the loop holds
    # the (M, M) normal matrix and its Cholesky factor plus ~16 (K,)
    # iterate/direction vectors
    itemsize = np.dtype(dtype).itemsize
    Nc = N + nf
    K = Nc + M
    budget = int(os.environ.get("BENSOLVE_IPM_BYTES", 2_000_000_000))
    per_inst = 2 * M * M * itemsize + 16 * K * itemsize
    chunk = max(1, min(B, budget // max(per_inst, 1)))
    if max_chunk:
        chunk = min(chunk, int(max_chunk))
    # floor to a power of two so the bucketed batch never pads past
    # the memory budget
    chunk = 1 << (chunk.bit_length() - 1)

    # carried interior start, mapped into the scaled/split space:
    # x' = x/cv, s' = s*r, y = row_dual/r; free-split pairs rebuilt with
    # min(x+, x-) = 1 (the same common mode the recentering keeps)
    warm = None
    if (warm_interior is not None
            and os.environ.get("BENSOLVE_IPM_WARM", "1") != "0"):
        wx, ws, wrd = (np.atleast_2d(np.asarray(a, np.float64))
                       for a in warm_interior)
        shapes_ok = (wx.shape[-1] == N and ws.shape[-1] == M
                     and wrd.shape[-1] == M
                     and wx.shape[0] in (1, B)
                     and ws.shape[0] == wx.shape[0]
                     and wrd.shape[0] == wx.shape[0])
        # per-instance warms may contain NaN rows (= start that row
        # cold, the _FacetWarm no-parent marker); a shared warm must be
        # fully finite
        finite_ok = (np.isfinite(wx).all() and np.isfinite(ws).all()
                     and np.isfinite(wrd).all()) \
            if wx.shape[0] == 1 else True
        if shapes_ok and finite_ok:
            Bw = wx.shape[0]
            xw = wx / cv[None, :]
            zw = np.concatenate(
                [xw, np.zeros((Bw, nf)), ws * r[None, :]], axis=1)
            if nf:
                zp = np.maximum(xw[:, free_col], 0.0) + 1.0
                zw[:, free_col] = zp
                zw[:, N:N + nf] = zp - xw[:, free_col]
            yw = wrd / r[None, :]
            if Bw == 1:
                zw = np.broadcast_to(zw, (B, zw.shape[1]))
                yw = np.broadcast_to(yw, (B, M))
            warm = (zw, yw)       # (B, K), (B, M)

    from bensolve_tpu.lp import ensure_compile_cache

    ensure_compile_cache()
    A_dev = jnp.asarray(As)
    split_dev = jnp.asarray(split)
    outs = []
    # global batch rows that were per-instance FROZEN (best iterate
    # stopped improving): the rescue pass skips them — a deterministic
    # re-run freezes at the same point
    frozen_rows: set = set()
    for s0 in range(0, B, chunk):
        sl = slice(s0, min(s0 + chunk, B))
        Bc = sl.stop - s0
        # bucket the chunk batch to a power of two (pad by repeating
        # row 0) so varying Benson frontier sizes reuse ONE compiled
        # program — a fresh ex09-scale compile costs ~10 minutes on the
        # remote-compilation backend
        Bp = 1 << (Bc - 1).bit_length()
        pad = Bp - Bc

        def _pad(a):
            a = a[sl]
            if pad:
                a = np.concatenate([a, np.broadcast_to(a[:1],
                                                       (pad,) + a.shape[1:])])
            return jnp.asarray(a, dtype)

        if verbose >= 2:
            print(f"lp_solve[ipm]: solving chunk {s0}..{sl.stop} "
                  f"of {B} (M={M} N={Nc} padded_batch={Bp})", flush=True)
        # On TPU the Cholesky / triangular-solve decompositions lower
        # to INTERNAL matmuls that honor the global default matmul
        # precision (bf16!) — the explicit precision= on our own
        # matmuls does not reach them.  Full-precision passes inside
        # the solve keep the Newton directions f32-grade.
        import jax as _jax

        mm = os.environ.get("BENSOLVE_IPM_MM_PREC", "highest")
        trace_on = os.environ.get("BENSOLVE_IPM_TRACE") == "1"
        seg = int(os.environ.get("BENSOLVE_IPM_SEG", "60"))
        c_p, l_p, u_p = _pad(c_s), _pad(l_s), _pad(u_s)
        if warm is not None:
            carry = _ipm_warm_init_jit(c_p, l_p, u_p, _pad(warm[0]),
                                       _pad(warm[1]), M)
        else:
            carry = _ipm_init_jit(c_p, l_p, u_p, M)
        if trace_on:
            carry = carry + (jnp.zeros((max_iter, 7), jnp.float32),)
        t_seg = _time.perf_counter()
        # adaptive straggler budget: once most of the chunk has resolved,
        # cap the remaining instances near 2x the median converged
        # iteration count.  Stragglers at ex09 scale restart-cycle at
        # ~0.45 s/iteration to the full budget (burning ~6 min/round for
        # 2-4 LPs while the rest finish in 60-95 iterations) and their
        # best iterate rarely improves past ~2x the pack's count — they
        # are classified from the best iterate either way (VERDICT r4
        # item 1a).  BENSOLVE_IPM_STRAGGLER_MULT tunes; 0 disables.
        smult = (0.0 if _rescue else float(
            os.environ.get("BENSOLVE_IPM_STRAGGLER_MULT", "2.0")))
        # best-score stall stop: when NO running instance has improved
        # its best KKT score by >10% for this many consecutive
        # segments, more budget is restart-thrash — classify from the
        # best iterate now.  This is what bounds a hard ex09 LP at
        # ~3 segments past its last improvement instead of the full
        # 800-iteration budget (observed 0.45 s/iteration).
        stall_cap = int(os.environ.get("BENSOLVE_IPM_STALL_SEGS", "3"))
        best_prev = None
        noimp_segs = None
        cap = max_iter
        # batch compaction: once enough instances finish, shrink the
        # lockstep batch to the running subset (pow2 ladder, each shape
        # compiled once and persisted in the compile cache).  The
        # S-build is per-instance FLOPs — without compaction 2
        # stragglers in a 16-wide chunk pay 8x their own cost per
        # iteration for the whole tail.  Finished rows are pulled to
        # host at compaction time; `live` maps current rows to the
        # chunk's original padded rows (-1 = pure padding).
        Bp_cur = Bp
        live = np.arange(Bp)
        K_tot = c_p.shape[1]
        Z_out = np.zeros((Bp, K_tot))
        Y_out = np.zeros((Bp, M))
        ZL_out = np.zeros((Bp, K_tot))
        ZU_out = np.zeros((Bp, K_tot))
        ST_out = np.full(Bp, -1, np.int32)
        IT_out = np.zeros(Bp, np.int32)
        written = np.zeros(Bp, bool)

        def _flush(carry, local_rows):
            idx = np.asarray(local_rows, int)
            if idx.size == 0:
                return
            st_l = np.asarray(carry[6])[idx]
            best = st_l < 0
            z_l = np.where(best[:, None], np.asarray(carry[10])[idx],
                           np.asarray(carry[0])[idx])
            y_l = np.where(best[:, None], np.asarray(carry[11])[idx],
                           np.asarray(carry[1])[idx])
            zl_l = np.where(best[:, None], np.asarray(carry[12])[idx],
                            np.asarray(carry[2])[idx])
            zu_l = np.where(best[:, None], np.asarray(carry[13])[idx],
                            np.asarray(carry[3])[idx])
            it_l = np.asarray(carry[7])[idx]
            for k, loc in enumerate(idx):
                orig = live[loc]
                if orig < 0 or written[orig]:
                    continue
                Z_out[orig] = z_l[k]
                Y_out[orig] = y_l[k]
                ZL_out[orig] = zl_l[k]
                ZU_out[orig] = zu_l[k]
                ST_out[orig] = st_l[k]
                IT_out[orig] = it_l[k]
                written[orig] = True

        with _jax.default_matmul_precision(mm):
            while True:
                carry = _ipm_seg_jit(A_dev, c_p, l_p, u_p, split_dev,
                                     carry, seg, max_iter)
                st_h = np.asarray(carry[6])
                it_h = np.asarray(carry[7])
                fin = st_h >= 0
                real = live >= 0
                n_fin_total = int(written.sum()) + int((fin & real).sum())
                if (smult > 0 and cap == max_iter
                        and n_fin_total >= max(1, (3 * Bp) // 4)):
                    fin_iters = np.concatenate(
                        [IT_out[written], it_h[fin & real]])
                    med = float(np.median(fin_iters))
                    cap = int(min(max_iter, max(smult * med + 40, 120)))
                run_it = int(it_h[~fin].max()) if (~fin).any() else 0
                # PER-INSTANCE best-score freeze: an instance whose own
                # best KKT score hasn't improved >10% for stall_cap
                # consecutive segments is restart-thrashing — flush it
                # (classified from its best iterate) and keep only the
                # still-improving ones running.  A global any-improved
                # criterion never fired with a dozen running instances.
                best = np.asarray(carry[14])
                if best_prev is None or best_prev.size != Bp_cur:
                    best_prev = best.copy()
                    noimp_segs = np.zeros(Bp_cur, int)
                else:
                    improved = best < 0.9 * best_prev
                    noimp_segs = np.where(improved, 0, noimp_segs + 1)
                    best_prev = np.minimum(best_prev, best)
                frozen = ((~fin) & (noimp_segs >= stall_cap)
                          if stall_cap > 0 else np.zeros(Bp_cur, bool))
                for j in np.flatnonzero(frozen & real):
                    if live[j] < Bc:
                        frozen_rows.add(int(s0 + live[j]))
                done = (fin | frozen).all() or run_it >= cap
                if verbose >= 2 and not done:
                    print(f"lp_solve[ipm]: segment it={int(it_h.max())} "
                          f"running={int((~fin).sum())}/{Bp_cur} "
                          f"cap={cap} "
                          f"frozen={int(frozen.sum())} "
                          f"({_time.perf_counter() - t_seg:.0f}s)",
                          flush=True)
                if done:
                    break
                n_run = int((~fin & ~frozen).sum())
                Bp_new = 1 << max(0, n_run - 1).bit_length()
                if not trace_on and n_run > 0 and Bp_new <= Bp_cur // 2:
                    _flush(carry, np.flatnonzero(fin | frozen))
                    keep = np.flatnonzero(~fin & ~frozen)
                    pad_k = np.full(Bp_new - keep.size, keep[0], int)
                    sel_np = np.concatenate([keep, pad_k])
                    sel = jnp.asarray(sel_np, jnp.int32)
                    carry = tuple(a[sel] for a in carry[:16]) \
                        + tuple(carry[16:])
                    c_p, l_p, u_p = c_p[sel], l_p[sel], u_p[sel]
                    live = np.concatenate(
                        [live[keep], np.full(pad_k.size, -1)])
                    Bp_cur = Bp_new
                    best_prev = best_prev[sel_np]
                    noimp_segs = noimp_segs[sel_np]
                    if verbose >= 2:
                        print(f"lp_solve[ipm]: compacted batch to "
                              f"{Bp_cur}", flush=True)
        _flush(carry, np.arange(Bp_cur))
        if trace_on:
            for k, hrow in enumerate(np.asarray(carry[16])):
                if not hrow.any():
                    break
                print(f"ipm it={k} mu={hrow[0]:.3e} pinf={hrow[1]:.3e} "
                      f"dinf={hrow[2]:.3e} gap={hrow[3]:.3e} "
                      f"ap={hrow[4]:.3f} ad={hrow[5]:.3f} "
                      f"sigma={hrow[6]:.3f}", flush=True)
        outs.append((Z_out[:Bc], Y_out[:Bc], ZL_out[:Bc], ZU_out[:Bc],
                     ST_out[:Bc], IT_out[:Bc]))
    z = np.concatenate([np.asarray(o[0], np.float64) for o in outs])
    y = np.concatenate([np.asarray(o[1], np.float64) for o in outs])
    zl = np.concatenate([np.asarray(o[2], np.float64) for o in outs])
    zu = np.concatenate([np.asarray(o[3], np.float64) for o in outs])
    status = np.concatenate([np.asarray(o[4]) for o in outs]).astype(
        np.int32)
    iters = np.concatenate([np.asarray(o[5]) for o in outs]).astype(
        np.int32)

    # host-side classification + polish (f64).  Polish every instance
    # that is OPTIMAL or still running, within a cost gate; still-
    # running instances that polish clean become OPTIMAL, the rest get
    # certificate-checked (Farkas / ray) before any INFEASIBLE or
    # UNBOUNDED verdict — heuristics alone misclassified the feasible
    # P2 template in round 3.  NOTE: polish is not merely accuracy —
    # it turns the IPM's interior duals into VERTEX duals, which the
    # Benson cut/eta constructions rely on (skipping it for strictly
    # converged instances changed ex05's vertex enumeration).
    As64 = np.asarray(As, np.float64)
    do_polish = polish if polish is not None else (M <= 1500)
    # host polish is ~M^2*|F| per least-squares round and the adaptive
    # repair can loop — budget the whole batch by a DETERMINISTIC work
    # measure (estimated flops of the rounds actually spent), so a
    # large frontier of f32-quality iterates cannot wedge a Benson
    # round for minutes (observed on ex07: 40 instances x repair loops
    # ~ half an hour) while identical inputs always polish identically
    # (a wall-clock budget made vertex selection load-dependent).
    budget_fl = float(os.environ.get("BENSOLVE_POLISH_BUDGET_FLOPS",
                                     "4e11"))
    per_round = 4.0 * M * M * min(6 * M + 16, K)
    rounds_cap = 24 if M <= 512 else 6
    spent = 0.0
    n_skipped = 0
    # provenance per instance: 0 raw device acceptance (strict OR the
    # in-loop stall/salvage at <=100x tol — the device does not say
    # which, so raw OPTIMALs get their quality MEASURED below),
    # 1 polished (KKT-verified on host), 2 loose host acceptance
    # (<=250x tol), 3 f64 simplex fallback (exact)
    prov = np.zeros(B, np.int8)
    for i in range(B):
        if crossed[i]:
            continue
        st = int(status[i])
        if st in (OPTIMAL, -1) and do_polish and spent <= budget_fl:
            zp, yp, ok, used = _polish_one(As64, z[i], y[i], zl[i],
                                           zu[i], l_s[i], u_s[i],
                                           c_s[i],
                                           max_rounds=rounds_cap)
            spent += used * per_round
            if ok:
                z[i], y[i] = zp, yp
                status[i] = OPTIMAL
                prov[i] = 1
                continue
        elif st in (OPTIMAL, -1) and do_polish:
            n_skipped += 1
        if st == -1:
            # classify leftovers: certificate, best-effort acceptance,
            # or ITLIM
            if _farkas_infeasible(As64, y[i], l_s[i], u_s[i]):
                status[i] = INFEASIBLE
            elif _unbounded_ray(As64, z[i], c_s[i], l_s[i], u_s[i]):
                status[i] = UNBOUNDED
            elif _loose_kkt_ok(As64, z[i], y[i], zl[i], zu[i], l_s[i],
                               u_s[i], c_s[i], _params(dtype)[0]):
                # budget exhausted with a near-feasible, near-
                # complementary iterate and no infeasibility/ray
                # evidence: accept.  This is the f32 endgame at scales
                # beyond the polish/fallback gates (ex09 probes hover
                # at pinf ~3e-3 after several restarts), where callers
                # run Benson at the reference's own loose epsilons.
                # Surfaced as quality=2 so the Benson loop can defer
                # rather than silently cut with ~1e-2-error duals.
                status[i] = OPTIMAL
                prov[i] = 2
            else:
                status[i] = ITLIM
        elif st == INFEASIBLE and not _farkas_infeasible(
                As64, y[i], l_s[i], u_s[i]):
            # downgrade uncertified heuristic verdicts
            if _unbounded_ray(As64, z[i], c_s[i], l_s[i], u_s[i]):
                status[i] = UNBOUNDED
            else:
                status[i] = ITLIM
        elif st == UNBOUNDED and not _unbounded_ray(
                As64, z[i], c_s[i], l_s[i], u_s[i]):
            status[i] = ITLIM

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

    # rescue pass: instances the ADAPTIVE STRAGGLER CAP cut off get ONE
    # full-budget, uncapped re-run (batch = just the stragglers).  The
    # r4-era cost of a hard LP (a full 800-iteration grind) is thus
    # paid once per hard instance instead of every Benson round, and a
    # persistent straggler can still end loose-accepted instead of
    # ITLIMing the deferral ledger to death (observed: ex07 round-15
    # vertex failing 6 rounds running under the cap).
    rescue_quality = {}
    host_fb = os.environ.get("BENSOLVE_HOST_FALLBACK", "1") != "0"
    if (not _rescue and not host_fb
            and float(os.environ.get("BENSOLVE_IPM_STRAGGLER_MULT",
                                     "2.0")) > 0):
        rs = np.array([i for i in np.flatnonzero(status == ITLIM)
                       if i not in frozen_rows], int)
        if rs.size:
            if verbose >= 2:
                print(f"lp_solve[ipm]: rescuing {rs.size} capped "
                      "instance(s) at full budget", flush=True)
            res_r = solve_batch_ipm(
                A, c2[rs], np.asarray(row_lb)[rs],
                np.asarray(row_ub)[rs], np.asarray(col_lb)[rs],
                np.asarray(col_ub)[rs], max_iter=max_iter, dtype=dtype,
                verbose=verbose, polish=polish, max_chunk=max_chunk,
                _rescue=True)
            status[rs] = res_r.status
            obj[rs] = res_r.obj
            x[rs] = res_r.x
            s[rs] = res_r.s
            row_dual[rs] = res_r.row_dual
            col_dual[rs] = res_r.col_dual
            iters[rs] += res_r.iters
            prov[rs] = 4   # quality comes from the rescue result
            for j, i0 in enumerate(rs):
                rescue_quality[int(i0)] = int(res_r.quality[j])

    # authoritative fallback: instances the IPM could not resolve
    # (ITLIM, no certificate, polish failed) are re-solved by the f64
    # simplex family when the shape is simplex-tractable.  This makes
    # the IPM route exact everywhere except truly huge instances,
    # where the caller accepted f32-grade tolerances to begin with.
    fb_default = "2000"
    try:
        if jax.default_backend() == "tpu":
            # the f64 simplex fallback is emulated (pivot-bound) on
            # TPU; 1500 covers ex07-scale stragglers (M ~ 1220, a few
            # LPs, ~minutes) while keeping ex09-scale (M ~ 4600, hours)
            # out — those rely on the rescue pass + loose acceptance
            fb_default = "1500"
    except Exception:
        pass
    fb_gate = int(os.environ.get("BENSOLVE_IPM_FALLBACK_M", fb_default))
    fb = np.flatnonzero(status == ITLIM)
    if fb.size and M <= fb_gate and not host_fb:
        from bensolve_tpu.lp import simplex as _sx
        from bensolve_tpu.lp import revised as _rv

        solver = (_rv.solve_batch_revised
                  if N > _rv.REVISED_RATIO * M else _sx.solve_batch)
        if verbose >= 2:
            print(f"lp_solve[ipm]: {fb.size} unresolved -> simplex "
                  "fallback", flush=True)
        res_fb = solver(A, c2[fb], np.asarray(row_lb)[fb],
                        np.asarray(row_ub)[fb], np.asarray(col_lb)[fb],
                        np.asarray(col_ub)[fb], dtype=np.float64)
        status[fb] = res_fb.status
        obj[fb] = res_fb.obj
        x[fb] = res_fb.x
        s[fb] = res_fb.s
        row_dual[fb] = res_fb.row_dual
        col_dual[fb] = res_fb.col_dual
        iters[fb] += res_fb.iters
        prov[fb] = 3

    # per-instance quality (LPResult.quality contract): polish and the
    # f64 fallback are verified exact (0); host loose acceptances are 2;
    # raw device OPTIMALs (strict convergence OR the in-loop 100x
    # stall/salvage — indistinguishable from the status alone, the r4
    # advisor finding) get their quality MEASURED from the f64 KKT
    # residuals of the returned iterate.
    tol0 = _params(dtype)[0]
    quality = np.zeros(B, np.int32)
    quality[prov == 2] = 2
    raw = np.flatnonzero((status == OPTIMAL) & (prov == 0))
    kkt_score = np.zeros(B)
    if raw.size:
        zr, yr = z[raw], y[raw]
        act = zr[:, :Nc] @ As64.T - zr[:, Nc:]
        pinf_r = np.abs(act).max(axis=1) / (
            1.0 + np.abs(zr).max(axis=1))
        rd = (c_s[raw] - np.concatenate([yr @ As64, -yr], axis=1)
              - zl[raw] + zu[raw])
        dinf_r = np.abs(np.where(l_s[raw] >= u_s[raw], 0.0, rd)).max(
            axis=1) / (1.0 + np.abs(c_s).max())
        has_lr = np.isfinite(l_s[raw]) & (l_s[raw] < u_s[raw])
        has_ur = np.isfinite(u_s[raw]) & (l_s[raw] < u_s[raw])
        with np.errstate(invalid="ignore"):
            comp = (np.where(has_lr, np.maximum(zr - l_s[raw], 0.0)
                             * zl[raw], 0.0).sum(axis=1)
                    + np.where(has_ur, np.maximum(u_s[raw] - zr, 0.0)
                               * zu[raw], 0.0).sum(axis=1))
        gap_r = comp / (1.0 + np.abs(
            np.einsum("bk,bk->b", c_s[raw], zr)))
        score = np.maximum(np.maximum(pinf_r, dinf_r), gap_r)
        kkt_score[raw] = score
        quality[raw] = np.where(score < 10 * tol0, 0,
                                np.where(score < 100 * tol0, 1, 2))
    for i0, qv in rescue_quality.items():
        quality[i0] = qv

    # terminal host fallback (default on): unresolved (ITLIM) and
    # loose-quality instances are re-solved EXACTLY by sparse HiGHS on
    # the host — the role GLPK plays for the reference
    # (bslv_lp.c:219-259).  The reference examples' huge matrices are
    # ~0.1% dense, so one straggler LP costs seconds on host where the
    # dense device paths are FLOP- or pivot-bound; bounded at 32 LPs
    # per call (BENSOLVE_HOST_FALLBACK_MAX overrides).
    if host_fb and not _rescue:
        hmax = int(os.environ.get("BENSOLVE_HOST_FALLBACK_MAX", "32"))
        # quality >= 1 goes to the exact solver too: salvaged (<=100x
        # tol) duals carry ~1e-2-scale errors — observed on ex09, a
        # quality-1 cut can fail to remove its own generating vertex
        # and the Benson loop inches one near-identical cut per round
        targets = np.flatnonzero(
            (status == ITLIM) | ((status == OPTIMAL) & (quality >= 1)))
        targets = targets[:hmax]
        if targets.size:
            if verbose >= 2:
                print(f"lp_solve[ipm]: host HiGHS fallback for "
                      f"{targets.size} instance(s)", flush=True)
            A_csr = _sparse_A(A)
            rlb_a, rub_a = np.asarray(row_lb), np.asarray(row_ub)
            clb_a, cub_a = np.asarray(col_lb), np.asarray(col_ub)
            t_h = _time.perf_counter()
            for i in targets:
                st_i, obj_i, x_i, s_i, rd_i, cd_i = _host_highs_one(
                    A_csr, np.asarray(c2[i], np.float64),
                    np.asarray(rlb_a[i], np.float64),
                    np.asarray(rub_a[i], np.float64),
                    np.asarray(clb_a[i], np.float64),
                    np.asarray(cub_a[i], np.float64))
                if st_i != ITLIM:
                    status[i] = st_i
                    obj[i] = obj_i
                    x[i] = x_i
                    s[i] = s_i
                    row_dual[i] = rd_i
                    col_dual[i] = cd_i
                    quality[i] = 0
                    prov[i] = 3
            if verbose >= 2:
                print(f"lp_solve[ipm]: host fallback done in "
                      f"{_time.perf_counter() - t_h:.1f}s", flush=True)

    if verbose >= 2:
        counts = dict(zip(*np.unique(status, return_counts=True)))
        qcounts = dict(zip(*np.unique(quality, return_counts=True)))
        print(f"lp_solve[ipm]: batch={B} statuses={counts} "
              f"quality={qcounts} iters max={int(iters.max())} "
              f"kkt max={kkt_score.max():.2e}"
              + (f" polish_skipped={n_skipped}" if n_skipped else ""),
              flush=True)
    return LPResult(status, obj, x, s, row_dual, col_dual,
                    iters, None, None, quality)

"""Pallas TPU kernel: a group of LPs per grid step, tableaus resident
in VMEM.

The XLA lockstep batch (simplex._solve_batch_jit) pays two taxes on
TPU: every while_loop iteration streams the whole (B, M, NT) tableau
through HBM ~3x, and all B instances run until the SLOWEST one
finishes.  This kernel instead assigns each grid step a GROUP of
G LPs (a multiple of 8 = the float32 sublane count, so group-wide row
vectors fill the VPU): the (G, M, NT) tableau block is loaded into VMEM
once, every pivot is VMEM-resident VPU work, the lockstep tail shrinks
from max-over-B to max-over-G, and the Pallas pipeline overlaps the
next group's input DMA with the current group's pivoting.

Warm starts: the kernel takes its INITIAL STATE as inputs — a shared
starting tableau W0 (= E for a cold start, = Binv @ E of a previous
round's optimal basis for a warm start, factorized once in XLA) plus
the matching basis/bound-pattern rows.  This is the in-kernel analogue
of GLPK's reuse of the previous basis (bslv_lp.c:31, 219-227): Benson
re-solves that change only bounds/objective typically re-verify in a
handful of pivots instead of re-deriving the basis from slacks.

No gathers/scatters: all dynamic indexing is expressed as one-hot
contractions and masked selects, which map directly onto the MXU/VPU.

Semantics mirror simplex._step (composite phase-1 bounded-variable
primal simplex, Dantzig/Bland pricing, bound flips, stability-broken
ratio ties); the accurate final primal/dual recovery runs outside in
XLA (simplex._final_solutions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bensolve_tpu.lp import linalg
from bensolve_tpu.lp import simplex as sx

BIG = 1e30  # stands in for +-inf inside the kernel (inf breaks 0*inf)
TOL_BND = 1e-5
TOL_DJ = 1e-5
TOL_PIV = 1e-6
GROUP = 8  # minimum LPs per grid step == f32 sublane count

# number of lp_batch_pallas invocations (production-path witness used by
# tests and the driver to assert the kernel actually ran)
CALLS = 0


def _kernel(W0_ref, c_ref, lb_ref, ub_ref,
            basis0_ref, basis0f_ref, in_basis0_ref, atup0_ref,
            lbB0_ref, ubB0_ref, cB0_ref, lane_f_ref, mlane_f_ref,
            status_ref, basis_ref, at_upper_ref, iters_ref,
            W_ref, *, M, NT, max_iter):
    f32 = jnp.float32
    G = c_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, NT), 1)   # (G, NT)
    mlane = jax.lax.broadcasted_iota(jnp.int32, (G, M), 1)   # (G, M)
    # float iotas come in as inputs: Mosaic supports neither float iota
    # nor int->float casts (the convert lowering loops)
    lane_f = lane_f_ref[...]
    del mlane                                                # unused

    c = c_ref[...]            # (G, NT)
    lb = lb_ref[...]
    ub = ub_ref[...]
    W_ref[...] = jnp.broadcast_to(W0_ref[...][None], (G, M, NT))

    lb_f = lb > -BIG
    ub_f = ub < BIG
    lo = jnp.where(lb_f, lb, jnp.where(ub_f, ub, 0.0))
    hi = jnp.where(ub_f, ub, jnp.where(lb_f, lb, 0.0))

    # initial basis state arrives as data (cold: slack basis; warm: the
    # previous solve's basis).  Carried masks are int32 (0/1): Mosaic
    # cannot lower selects whose VALUES are i1 vectors; predicates stay
    # boolean.
    basis0 = basis0_ref[...]                         # (G, M) int32
    basis0_f = basis0f_ref[...]                      # (G, M) f32 shadow
    in_basis0 = in_basis0_ref[...]                   # (G, NT) int32
    at_upper0 = atup0_ref[...]                       # (G, NT) int32
    lbB0 = lbB0_ref[...]                             # (G, M)
    ubB0 = ubB0_ref[...]
    cB0 = cB0_ref[...]

    # batched matvecs as multiply+reduce: Mosaic's dot lowering cannot
    # express a batched vector-matrix product (no lhs non-contracting
    # dims), and the VPU does the same FLOPs either way
    def bdot_vec_mat(v, Wt):
        """(G, M) . (G, M, NT) -> (G, NT), batched over G."""
        return jnp.sum(Wt * v[:, :, None], axis=1)

    def bdot_mat_vec(Wt, v):
        """(G, M, NT) . (G, NT) -> (G, M), batched over G."""
        return jnp.sum(Wt * v[:, None, :], axis=2)

    zn0 = jnp.where(in_basis0 > 0, 0.0, jnp.where(at_upper0 > 0, hi, lo))
    xb0 = -bdot_mat_vec(W_ref[...], zn0)            # (G, M)

    # phase-2 reduced-cost row, carried and rank-1-updated like a cost
    # row of the extended tableau (d2 -= d2_q * w_r_scaled per pivot).
    # While every LP in the group is feasible the pricing pass over the
    # whole (G, M, NT) tableau is skipped entirely — the majority of
    # iterations once phase 1 ends.
    d2_0 = c - bdot_vec_mat(cB0, W_ref[...])

    # devex reference weights (Forrest-Goldfarb): entering score
    # d^2/gamma instead of |d| — fewer, better pivots for the same
    # per-iteration cost (a couple of extra (G, NT) VPU ops)
    gamma0 = jnp.zeros((G, NT), f32) + 1.0

    crossed = jnp.any(lb > ub, axis=1, keepdims=True)          # (G, 1)
    status0 = jnp.where(crossed, sx.INFEASIBLE,
                        sx.RUNNING).astype(jnp.int32)

    def cond(carry):
        return jnp.any(carry[0] == sx.RUNNING)

    def body(carry):
        (status, basis, basis_f, in_basis, at_upper, xb, lbB, ubB, cB, stall,
         it, k, d2, gamma) = carry
        W = W_ref[...]
        running = status == sx.RUNNING                         # (G, 1)

        viol_lo = xb < lbB - TOL_BND                           # (G, M)
        viol_up = xb > ubB + TOL_BND
        feasible = ~jnp.any(viol_lo | viol_up, axis=1, keepdims=True)

        def composite_price(_):
            cB1 = jnp.where(viol_up, 1.0, 0.0) + \
                jnp.where(viol_lo, -1.0, 0.0)
            cB_eff = jnp.where(feasible, cB, cB1).astype(f32)
            return jnp.where(feasible, c, 0.0) - bdot_vec_mat(cB_eff, W)

        # the full pricing pass runs only while SOME group member is
        # still infeasible (composite phase-1 costs are not rank-1
        # maintainable) or on the periodic drift refresh; otherwise the
        # carried d2 row prices the whole iteration for free
        run_pass = jnp.any(running & ~feasible) | (k % 128 == 0)
        d = jax.lax.cond(run_pass, composite_price, lambda _: d2, 0)
        # opportunistic exact refresh of the carried row (for feasible
        # rows the composite pass IS the phase-2 pricing)
        d2 = jnp.where(feasible, d, d2)

        val = jnp.where(at_upper > 0, hi, lo)
        nonbasic = in_basis == 0
        elig_inc = nonbasic & (val < ub) & (d < -TOL_DJ)
        elig_dec = nonbasic & (val > lb) & (d > TOL_DJ)
        eligible = elig_inc | elig_dec
        use_bland = stall > sx.BLAND_AFTER                     # (G, 1)
        # NOTE: Mosaic's convert lowering loops on bool->float /
        # int->float casts and its argmax is float32-only, so Bland
        # scores use float iotas and a float shadow of the basis
        score = jnp.where(eligible, d * d / gamma, -BIG)
        q_dtz = jnp.argmax(score, axis=1, keepdims=True).astype(jnp.int32)
        bscore = jnp.where(eligible, -lane_f, -BIG)
        q_bld = jnp.argmax(bscore, axis=1, keepdims=True).astype(jnp.int32)
        q = jnp.where(use_bland, q_bld, q_dtz)
        has_entering = jnp.any(eligible, axis=1, keepdims=True)

        oq = lane == q                                         # (G, NT)
        oq_f = jnp.where(oq, 1.0, 0.0).astype(f32)
        sigma = jnp.where(jnp.any(elig_inc & oq, axis=1, keepdims=True),
                          1.0, -1.0)                           # (G, 1)
        alpha = bdot_mat_vec(W, oq_f)                          # (G, M)
        rate = -sigma * alpha

        inc = rate > TOL_PIV
        dec = rate < -TOL_PIV
        target_inc = jnp.where(viol_lo, lbB, ubB)
        target_dec = jnp.where(viol_up, ubB, lbB)
        t_inc = jnp.where(viol_up, BIG, (target_inc - xb) / rate)
        t_dec = jnp.where(viol_lo, BIG, (target_dec - xb) / rate)
        t = jnp.where(inc, t_inc, jnp.where(dec, t_dec, BIG))
        t = jnp.clip(t, 0.0, BIG)                              # (G, M)
        tmin = jnp.min(t, axis=1, keepdims=True)               # (G, 1)

        cand = t <= tmin + 1e-12
        stab = jnp.where(cand, jnp.abs(rate), -1.0)
        r_stab = jnp.argmax(stab, axis=1, keepdims=True).astype(jnp.int32)
        bleave = jnp.where(cand, -basis_f, -BIG)
        r_bld = jnp.argmax(bleave, axis=1, keepdims=True).astype(jnp.int32)
        r = jnp.where(use_bland, r_bld, r_stab)
        mlane_k = jax.lax.broadcasted_iota(jnp.int32, (G, M), 1)
        orow = mlane_k == r                                    # (G, M)
        orow_f = jnp.where(orow, 1.0, 0.0).astype(f32)

        lb_q = jnp.where(jnp.any(lb_f & oq, axis=1, keepdims=True),
                         jnp.sum(lb * oq_f, axis=1, keepdims=True), -BIG)
        ub_q = jnp.where(jnp.any(ub_f & oq, axis=1, keepdims=True),
                         jnp.sum(ub * oq_f, axis=1, keepdims=True), BIG)
        span = ub_q - lb_q
        do_flip = span < tmin
        t_star = jnp.where(do_flip, span, tmin)                # (G, 1)

        finish = jnp.where(feasible, sx.OPTIMAL, sx.INFEASIBLE)
        unbounded = has_entering & feasible & (t_star >= BIG)
        stat_next = jnp.where(
            ~has_entering, finish,
            jnp.where(unbounded, sx.UNBOUNDED,
                      jnp.where(it + 1 >= max_iter, sx.ITLIM,
                                sx.RUNNING))).astype(jnp.int32)
        new_status = jnp.where(running, stat_next, status)
        act = running & has_entering & (t_star < BIG)          # (G, 1)

        delta = jnp.where(act, sigma * t_star, 0.0)
        xb_new = xb - delta * alpha

        do_pivot = act & ~do_flip                              # (G, 1)
        alpha_r = jnp.sum(alpha * orow_f, axis=1, keepdims=True)
        alpha_r = jnp.where(jnp.abs(alpha_r) < TOL_PIV,
                            jnp.where(alpha_r < 0, -TOL_PIV, TOL_PIV),
                            alpha_r)

        # rank-1 tableau update, entirely in VMEM.  3-D masks are
        # rebuilt from float32 broadcasts: Mosaic cannot insert a minor
        # dim on i1 vectors, but f32 reshapes + compare are fine.
        w_r = bdot_vec_mat(orow_f, W)                          # (G, NT)
        w_r_scaled = w_r / alpha_r
        W_upd = W - alpha[:, :, None] * w_r_scaled[:, None, :]
        orow3 = orow_f[:, :, None] > 0.5                       # (G, M, 1)
        W_upd = jnp.where(orow3, w_r_scaled[:, None, :], W_upd)
        dp_f = jnp.where(do_pivot, 1.0, 0.0).astype(f32)       # (G, 1)
        W_ref[...] = jnp.where(dp_f[:, :, None] > 0.5, W_upd, W)

        leaving = jnp.sum(basis * orow.astype(jnp.int32), axis=1,
                          keepdims=True)                       # (G, 1)
        val_q = jnp.sum(val * oq_f, axis=1, keepdims=True)
        xq_new = val_q + delta
        xb_new = jnp.where(do_pivot & orow, xq_new, xb_new)
        basis_new = jnp.where(do_pivot & orow, q, basis)
        q_f = jnp.sum(lane_f * oq_f, axis=1, keepdims=True)
        basis_f_new = jnp.where(do_pivot & orow, q_f, basis_f)
        lbB_new = jnp.where(do_pivot & orow, lb_q, lbB)
        ubB_new = jnp.where(do_pivot & orow, ub_q, ubB)
        cB_q = jnp.sum(c * oq_f, axis=1, keepdims=True)
        cB_new = jnp.where(do_pivot & orow, cB_q, cB)

        in_basis_new = jnp.where(
            do_pivot & oq, 1,
            jnp.where(do_pivot & (lane == leaving), 0, in_basis))

        rate_r = jnp.sum(rate * orow_f, axis=1, keepdims=True)
        viol_lo_r = jnp.any(viol_lo & orow, axis=1, keepdims=True)
        viol_up_r = jnp.any(viol_up & orow, axis=1, keepdims=True)
        leave_at_upper = jnp.where(rate_r > 0,
                                   1 - viol_lo_r.astype(jnp.int32),
                                   viol_up_r.astype(jnp.int32))
        at_upper_new = jnp.where(do_pivot & (lane == leaving),
                                 leave_at_upper, at_upper)
        q_at_upper = jnp.any((at_upper > 0) & oq, axis=1, keepdims=True)
        at_upper_new = jnp.where((act & do_flip) & oq,
                                 1 - q_at_upper.astype(jnp.int32),
                                 at_upper_new)

        # carried reduced-cost row: the standard cost-row rank-1 update
        # (d2' = d2 - d2_q * new_row_r), valid regardless of which
        # objective chose the pivot
        d2_qv = jnp.sum(d2 * oq_f, axis=1, keepdims=True)      # (G, 1)
        dp3 = do_pivot & (lane >= 0)                           # (G, NT)
        d2_new = jnp.where(dp3, d2 - d2_qv * w_r_scaled, d2)

        # devex weights (Forrest-Goldfarb reference framework)
        gamma_q = jnp.sum(gamma * oq_f, axis=1, keepdims=True)
        g_upd = jnp.maximum(gamma, w_r_scaled * w_r_scaled * gamma_q)
        g_leave = jnp.maximum(gamma_q / (alpha_r * alpha_r), 1.0)
        g_upd = jnp.where(lane == leaving, g_leave, g_upd)
        gamma_new = jnp.where(dp3, g_upd, gamma)
        gamma_new = jnp.where(gamma_new > 1e8, 1.0, gamma_new)

        degen = act & (t_star < TOL_BND)
        stall_new = jnp.where(act, jnp.where(degen, stall + 1, 0), stall)
        it_new = it + act.astype(jnp.int32)

        return (new_status, basis_new, basis_f_new, in_basis_new,
                at_upper_new, xb_new, lbB_new, ubB_new, cB_new, stall_new,
                it_new, k + 1, d2_new, gamma_new)

    init = (status0, basis0, basis0_f, in_basis0, at_upper0, xb0, lbB0,
            ubB0, cB0,
            jnp.zeros((G, 1), jnp.int32), jnp.zeros((G, 1), jnp.int32),
            jnp.zeros((), jnp.int32), d2_0, gamma0)
    (status, basis, basis_f, in_basis, at_upper, xb, lbB, ubB, cB, stall,
     it, k, d2, gamma) = jax.lax.while_loop(cond, body, init)

    status_ref[...] = jnp.where(status == sx.RUNNING, sx.ITLIM, status)
    iters_ref[...] = it
    at_upper_ref[...] = at_upper
    basis_ref[...] = basis


def solve_batch_pallas(W0, c, lb, ub, basis0, at_upper0, max_iter,
                       interpret=False, group=GROUP):
    """Run the grouped per-LP kernel over the batch.

    ``W0``: (M, NT) shared starting tableau — E = [I | -A] for a cold
    start or Binv @ E of a shared warm basis; M % 8 == 0, NT % 128 == 0.
    ``c``/``lb``/``ub``: (B, NT) float32 (+-inf encoded as +-BIG);
    B % ``group`` == 0.  ``basis0``: (M,) int32 basis matching W0.
    ``at_upper0``: (B, NT) bool nonbasic bound pattern.
    Returns (status, basis, at_upper, iters).

    ``group``: LPs per grid step (multiple of 8).  Larger groups make
    every VPU op wider, amortizing while-loop instruction overhead, at
    the cost of a longer lockstep tail (max-over-group iterations) and
    (group+1)*M*NT*4 bytes of VMEM.  Choose the largest group whose
    tableau block fits comfortably in VMEM (see _pick_group).

    Tracing happens with x64 disabled: under jax_enable_x64 argmax
    yields int64, whose int64->int32 cast loops forever in the Mosaic
    convert lowering."""
    with jax.enable_x64(False):
        return _solve_batch_pallas_jit(W0, c, lb, ub, basis0, at_upper0,
                                       max_iter, interpret, group)


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "interpret", "group"))
def _solve_batch_pallas_jit(W0, c, lb, ub, basis0, at_upper0, max_iter,
                            interpret=False, group=GROUP):
    B, NT = c.shape
    M = W0.shape[0]
    kern = functools.partial(_kernel, M=M, NT=NT, max_iter=max_iter)
    G = group
    import sys
    if sys.getrecursionlimit() < 20000:
        # the Mosaic kernel tracer recurses deeply through the while-loop
        # body's expression tree
        sys.setrecursionlimit(20000)
    lane_f = jnp.broadcast_to(
        jnp.arange(NT, dtype=jnp.float32)[None, :], (G, NT))
    mlane_f = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.float32)[None, :], (G, M))
    # initial-state rows derived from (basis0, at_upper0) in XLA —
    # gathers are cheap here and unsupported in Mosaic
    basis0_b = jnp.broadcast_to(basis0[None, :].astype(jnp.int32), (G, M))
    basis0_f = basis0_b.astype(jnp.float32)
    in_basis1 = jnp.zeros(NT, bool).at[basis0].set(True)
    in_basis0 = jnp.broadcast_to(in_basis1[None, :], (G, NT))
    atup = at_upper0 & ~in_basis1[None, :]
    basis_rows = jnp.broadcast_to(basis0[None, :].astype(jnp.int32), (B, M))
    lbB0 = jnp.take_along_axis(lb, basis_rows, axis=1)
    ubB0 = jnp.take_along_axis(ub, basis_rows, axis=1)
    cB0 = jnp.take_along_axis(c, basis_rows, axis=1)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((M, NT), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NT), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NT), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NT), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NT), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NT), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NT), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NT), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, M), jnp.int32),
            jax.ShapeDtypeStruct((B, NT), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((G, M, NT), jnp.float32)],
        # the default scoped-vmem limit is 16 MiB; the tableau scratch
        # block legitimately uses most of the core's VMEM (128 MiB on
        # v5e) for large groups
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(W0, c, lb, ub, basis0_b, basis0_f, in_basis0.astype(jnp.int32),
      atup.astype(jnp.int32), lbB0, ubB0, cB0, lane_f, mlane_f)
    status, basis, at_upper, iters = out
    return status[:, 0], basis, at_upper.astype(bool), iters[:, 0]


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


# VMEM budget for the tableau scratch block, bytes.  v5e/v4 expose
# ~128 MiB of VMEM per core (vmem_limit_bytes below raises Mosaic's
# 16 MiB scoped default); leave headroom for the input/output blocks
# and the pipeline's double buffers.
VMEM_BUDGET = 64 * 1024 * 1024
MAX_GROUP = 256


def _pick_group(M: int, NT: int, Bp: int) -> int:
    """Largest group (multiple of 8, <= MAX_GROUP, <= Bp) whose
    (G, M, NT) f32 tableau block plus W0 fits the VMEM budget."""
    per_lp = M * NT * 4
    avail = VMEM_BUDGET - M * NT * 4  # minus the shared W0 block
    g = max(1, avail // max(per_lp, 1))
    g = min(int(g), MAX_GROUP, Bp)
    return max(GROUP, (g // GROUP) * GROUP) if g >= GROUP else GROUP


def shape_supported(M: int, N: int) -> bool:
    """True when a minimum-size group fits the VMEM budget (the gate
    solve_batch_auto uses before routing a batch here)."""
    Mp = sx._bucket(M)
    NT = _pad128(Mp + sx._bucket(N))
    return (GROUP + 2) * Mp * NT * 4 <= VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=())
def _warm_tableau(E, A_p, basis0):
    """W0 = Binv @ E for a shared warm basis (one f32 LU in XLA)."""
    Bmat = sx._build_basis_matrix(A_p, basis0)
    lu, piv = linalg.lu_factor(Bmat)
    return linalg.lu_solve((lu, piv), E)


def try_solve_batch(A, c, row_lb, row_ub, col_lb, col_ub, *,
                    max_iter=None, dtype=np.float32, start_basis=None,
                    max_chunk=None, group=None,
                    interpret=None) -> sx.LPResult | None:
    """solve_batch-compatible entry used by solve_batch_auto: returns
    None when this backend cannot take the call (per-instance warm
    starts), so the caller falls through to the XLA tableau path."""
    if start_basis is not None:
        b0 = start_basis[0] if isinstance(start_basis, tuple) \
            else start_basis
        if np.asarray(b0).ndim != 1:
            return None   # per-instance warm bases: XLA path only
    return lp_batch_pallas(A, c, row_lb, row_ub, col_lb, col_ub,
                           max_iter=max_iter, start_basis=start_basis,
                           group=group, interpret=interpret)


def lp_batch_pallas(A, c, row_lb, row_ub, col_lb, col_ub, *,
                    max_iter: int | None = None,
                    interpret: bool | None = None,
                    start_basis=None,
                    group: int | None = None) -> sx.LPResult:
    """solve_batch-compatible wrapper around the Pallas kernel (float32;
    M padded to 8s, NT to 128s, batch to a power-of-two multiple of the
    group size so frontier-size changes reuse few compiled shapes).
    Falls back to interpret mode off TPU so the same code path is
    testable on CPU."""
    global CALLS
    CALLS += 1
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    dtype = np.float32
    prep = sx._prepare_A(A, dtype)
    A_np, M, N = prep.A, prep.M, prep.N
    c = np.atleast_2d(np.asarray(c, dtype))
    B = c.shape[0]
    Mp = prep.Mp
    NT = _pad128(Mp + sx._bucket(N))
    Np = NT - Mp
    if group is None:
        group = GROUP if interpret else _pick_group(Mp, NT, -(-B // 8) * 8)
    # bucket the batch to a power-of-two multiple of the group (few
    # compiled shapes across Benson rounds)
    Bp = max(group, group * (1 << max(0, (-(-B // group)) - 1).bit_length()))
    if max_iter is None:
        max_iter = 50 * (Mp + Np) + 500

    def _pad(arr, k, kp, fill):
        arr = np.asarray(arr, dtype)
        out = np.full((Bp, kp), fill, dtype)
        out[:B, :k] = arr
        if Bp > B:
            out[B:, :k] = arr[:1]
        return out

    full_c = np.concatenate(
        [np.zeros((Bp, Mp), dtype), _pad(c, N, Np, 0.0)], axis=1)
    lb = np.concatenate(
        [_pad(row_lb, M, Mp, -BIG), _pad(col_lb, N, Np, 0.0)], axis=1)
    ub = np.concatenate(
        [_pad(row_ub, M, Mp, BIG), _pad(col_ub, N, Np, 0.0)], axis=1)
    lb = np.clip(np.nan_to_num(lb, posinf=BIG, neginf=-BIG), -BIG, BIG
                 ).astype(dtype)
    ub = np.clip(np.nan_to_num(ub, posinf=BIG, neginf=-BIG), -BIG, BIG
                 ).astype(dtype)
    E = _prepared_E(prep, Np)

    if start_basis is None:
        basis0 = np.arange(Mp, dtype=np.int32)
        atup_pattern = np.zeros(NT, bool)
        W0 = jnp.asarray(E)
    else:
        if isinstance(start_basis, tuple):
            b0, u0 = start_basis
        else:
            b0, u0 = start_basis, np.zeros(NT, bool)
        basis0 = np.asarray(b0, np.int32)
        u0 = np.asarray(u0, bool)
        atup_pattern = np.zeros(NT, bool)
        atup_pattern[: u0.size] = u0
        with jax.enable_x64(False):
            Ap_dev = jnp.asarray(np.asarray(
                np.pad(np.asarray(A_np, dtype),
                       ((0, Mp - M), (0, Np - N)))))
            W0 = _warm_tableau(jnp.asarray(E), Ap_dev, jnp.asarray(basis0))

    # default nonbasic rest pattern: only-upper-bounded rest at ub
    in_b = np.zeros(NT, bool)
    in_b[basis0] = True
    atup_full = ((atup_pattern[None, :] | ((lb <= -BIG) & (ub < BIG)))
                 & (ub < BIG) & ~in_b[None, :])

    status, basis, at_upper, iters = solve_batch_pallas(
        W0, jnp.asarray(full_c), jnp.asarray(lb),
        jnp.asarray(ub), jnp.asarray(basis0), jnp.asarray(atup_full),
        max_iter, interpret=interpret, group=group)

    # accurate recovery via the shared final-solution path (float32 LU)
    basis_j = jnp.asarray(basis)
    in_basis = jnp.zeros((Bp, NT), bool).at[
        jnp.arange(Bp)[:, None], basis_j].set(True)
    lbj = jnp.where(jnp.asarray(lb) <= -BIG, -jnp.inf, jnp.asarray(lb))
    ubj = jnp.where(jnp.asarray(ub) >= BIG, jnp.inf, jnp.asarray(ub))
    A_p = np.zeros((Mp, Np), dtype)
    A_p[:M, :N] = np.asarray(A_np, dtype)
    st = sx._State(
        basis=basis_j, in_basis=in_basis, at_upper=jnp.asarray(at_upper),
        W=None, xb=None, lbB=None, ubB=None,
        cB=jnp.take_along_axis(jnp.asarray(full_c), basis_j, axis=1),
        status=jnp.asarray(status), stall=None, iters=jnp.asarray(iters),
        step=None)
    obj, x, s_act, row_dual, col_dual = _final_jit(
        jnp.asarray(A_p), jnp.asarray(full_c), lbj, ubj, st)
    status = np.asarray(status)
    return sx.LPResult(status[:B], np.asarray(obj)[:B],
                       np.asarray(x)[:B, :N], np.asarray(s_act)[:B, :M],
                       np.asarray(row_dual)[:B, :M],
                       np.asarray(col_dual)[:B, :N],
                       np.asarray(iters)[:B], np.asarray(basis)[:B],
                       np.asarray(at_upper)[:B])


_E_CACHE: dict = {}


def _prepared_E(prep: sx._PreparedA, Np: int) -> np.ndarray:
    """E = [I | -A_padded] for the pallas NT padding, memoized like
    _prepare_A (keyed on the prepared matrix identity)."""
    key = (id(prep), Np)
    hit = _E_CACHE.get(key)
    if hit is not None and hit[0] is prep:
        return hit[1]
    dtype = np.float32
    M, N, Mp = prep.M, prep.N, prep.Mp
    A_p = np.zeros((Mp, Np), dtype)
    A_p[:M, :N] = np.asarray(prep.A, dtype)
    E = np.concatenate([np.eye(Mp, dtype=dtype), -A_p], axis=1)
    if len(_E_CACHE) > 8:
        _E_CACHE.clear()
    _E_CACHE[key] = (prep, E)
    return E


@jax.jit
def _final_jit(A, c, lb, ub, st):
    return sx._final_solutions(A, c, lb, ub, st)

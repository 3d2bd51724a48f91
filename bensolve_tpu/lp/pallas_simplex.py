"""Pallas TPU kernel: a group of 8 LPs per grid step, tableaus resident
in VMEM.

The XLA lockstep batch (simplex._solve_batch_jit) pays two taxes on
TPU: every while_loop iteration streams the whole (B, M, NT) tableau
through HBM ~3x, and all B instances run until the SLOWEST one
finishes.  This kernel instead assigns each grid step a GROUP of
G = 8 LPs (8 = the float32 sublane count, so group-wide row vectors
fill the VPU): the (G, M, NT) tableau block is loaded into VMEM once,
every pivot is VMEM-resident VPU work, the lockstep tail shrinks from
max-over-B to max-over-8, and the Pallas pipeline overlaps the next
group's input DMA with the current group's pivoting.

No gathers/scatters: all dynamic indexing is expressed as one-hot
contractions (dot_general) and masked selects, which map directly onto
the MXU/VPU.

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

from bensolve_tpu.lp import simplex as sx

BIG = 1e30  # stands in for +-inf inside the kernel (inf breaks 0*inf)
TOL_BND = 1e-5
TOL_DJ = 1e-5
TOL_PIV = 1e-6
GROUP = 8  # LPs per grid step == f32 sublane count


def _kernel(E_ref, c_ref, lb_ref, ub_ref, lane_f_ref, mlane_f_ref,
            status_ref, basis_ref, at_upper_ref, iters_ref,
            W_ref, *, M, NT, max_iter):
    f32 = jnp.float32
    G = c_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, NT), 1)   # (G, NT)
    mlane = jax.lax.broadcasted_iota(jnp.int32, (G, M), 1)   # (G, M)
    # float iotas come in as inputs: Mosaic supports neither float iota
    # nor int->float casts (the convert lowering loops)
    lane_f = lane_f_ref[...]
    mlane_f = mlane_f_ref[...]

    c = c_ref[...]            # (G, NT)
    lb = lb_ref[...]
    ub = ub_ref[...]
    W_ref[...] = jnp.broadcast_to(E_ref[...][None], (G, M, NT))

    lb_f = lb > -BIG
    ub_f = ub < BIG
    lo = jnp.where(lb_f, lb, jnp.where(ub_f, ub, 0.0))
    hi = jnp.where(ub_f, ub, jnp.where(lb_f, lb, 0.0))

    basis0 = mlane                                  # slacks 0..M-1
    # carried masks are int32 (0/1): Mosaic cannot lower selects whose
    # VALUES are i1 vectors ("Unsupported target bitwidth for
    # truncation" on real TPU); predicates stay boolean
    in_basis0 = (lane < M).astype(jnp.int32)
    at_upper0 = ((~lb_f) & ub_f & (in_basis0 == 0)).astype(jnp.int32)
    lbB0 = jnp.where(lb_f, lb, -BIG)[:, :M]
    ubB0 = jnp.where(ub_f, ub, BIG)[:, :M]
    cB0 = c[:, :M]

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

    crossed = jnp.any(lb > ub, axis=1, keepdims=True)          # (G, 1)
    status0 = jnp.where(crossed, sx.INFEASIBLE,
                        sx.RUNNING).astype(jnp.int32)

    def cond(carry):
        return jnp.any(carry[0] == sx.RUNNING)

    def body(carry):
        (status, basis, basis_f, in_basis, at_upper, xb, lbB, ubB, cB, stall,
         it) = carry
        W = W_ref[...]
        running = status == sx.RUNNING                         # (G, 1)

        viol_lo = xb < lbB - TOL_BND                           # (G, M)
        viol_up = xb > ubB + TOL_BND
        feasible = ~jnp.any(viol_lo | viol_up, axis=1, keepdims=True)

        cB1 = jnp.where(viol_up, 1.0, 0.0) + jnp.where(viol_lo, -1.0, 0.0)
        cB_eff = jnp.where(feasible, cB, cB1).astype(f32)

        d = jnp.where(feasible, c, 0.0) - bdot_vec_mat(cB_eff, W)

        val = jnp.where(at_upper > 0, hi, lo)
        nonbasic = in_basis == 0
        elig_inc = nonbasic & (val < ub) & (d < -TOL_DJ)
        elig_dec = nonbasic & (val > lb) & (d > TOL_DJ)
        eligible = elig_inc | elig_dec
        use_bland = stall > sx.BLAND_AFTER                     # (G, 1)
        # NOTE: Mosaic's convert lowering loops on bool->float /
        # int->float casts and its argmax is float32-only, so Bland
        # scores use float iotas and a float shadow of the basis
        score = jnp.where(eligible, jnp.abs(d), -BIG)
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
        orow = mlane == r                                      # (G, M)
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

        degen = act & (t_star < TOL_BND)
        stall_new = jnp.where(act, jnp.where(degen, stall + 1, 0), stall)
        it_new = it + act.astype(jnp.int32)

        return (new_status, basis_new, basis_f_new, in_basis_new,
                at_upper_new, xb_new, lbB_new, ubB_new, cB_new, stall_new,
                it_new)

    init = (status0, basis0, mlane_f, in_basis0, at_upper0, xb0, lbB0,
            ubB0, cB0,
            jnp.zeros((G, 1), jnp.int32), jnp.zeros((G, 1), jnp.int32))
    (status, basis, basis_f, in_basis, at_upper, xb, lbB, ubB, cB, stall,
     it) = jax.lax.while_loop(cond, body, init)

    status_ref[...] = jnp.where(status == sx.RUNNING, sx.ITLIM, status)
    iters_ref[...] = it
    at_upper_ref[...] = at_upper
    basis_ref[...] = basis


def solve_batch_pallas(E, c, lb, ub, max_iter, interpret=False, group=GROUP):
    """Run the grouped per-LP kernel over the batch.

    ``E``: (M, NT) with E = [I | -A]; M % 8 == 0, NT % 128 == 0.
    ``c``/``lb``/``ub``: (B, NT) float32 (+-inf encoded as +-BIG);
    B % ``group`` == 0.  Returns (status, basis, at_upper, iters).

    ``group``: LPs per grid step (multiple of 8).  Larger groups make
    every VPU op wider, amortizing while-loop instruction overhead, at
    the cost of a longer lockstep tail (max-over-group iterations) and
    (group+1)*M*NT*4 bytes of VMEM.  Choose the largest group whose
    tableau block fits comfortably in VMEM (see _pick_group).

    Tracing happens with x64 disabled: under jax_enable_x64 argmax
    yields int64, whose int64->int32 cast loops forever in the Mosaic
    convert lowering."""
    with jax.enable_x64(False):
        return _solve_batch_pallas_jit(E, c, lb, ub, max_iter, interpret,
                                       group)


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "interpret", "group"))
def _solve_batch_pallas_jit(E, c, lb, ub, max_iter, interpret=False,
                            group=GROUP):
    B, NT = c.shape
    M = E.shape[0]
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
    )(E, c, lb, ub, lane_f, mlane_f)
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
    (G, M, NT) f32 tableau block plus E fits the VMEM budget."""
    per_lp = M * NT * 4
    avail = VMEM_BUDGET - M * NT * 4  # minus the shared E block
    g = max(1, avail // max(per_lp, 1))
    g = min(int(g), MAX_GROUP, Bp)
    return max(GROUP, (g // GROUP) * GROUP) if g >= GROUP else GROUP


def lp_batch_pallas(A, c, row_lb, row_ub, col_lb, col_ub, *,
                    max_iter: int | None = None,
                    interpret: bool | None = None,
                    group: int | None = None) -> sx.LPResult:
    """solve_batch-compatible wrapper around the Pallas kernel (float32;
    M padded to 8s, NT to 128s, batch to a multiple of the group size).
    Falls back to interpret mode off TPU so the same code path is
    testable on CPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = np.float32
    A = np.asarray(A, dtype)
    M, N = A.shape
    c = np.atleast_2d(np.asarray(c, dtype))
    B = c.shape[0]
    Mp = sx._bucket(M)
    NT = _pad128(Mp + sx._bucket(N))
    Np = NT - Mp
    if group is None:
        group = GROUP if interpret else _pick_group(Mp, NT, -(-B // 8) * 8)
    Bp = max(group, -(-B // group) * group)
    if max_iter is None:
        max_iter = 50 * (Mp + Np) + 500
    A_p = np.zeros((Mp, Np), dtype)
    A_p[:M, :N] = A

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
    lb = np.clip(lb, -BIG, BIG).astype(dtype)
    ub = np.clip(ub, -BIG, BIG).astype(dtype)
    E = np.concatenate([np.eye(Mp, dtype=dtype), -A_p], axis=1)

    status, basis, at_upper, iters = solve_batch_pallas(
        jnp.asarray(E), jnp.asarray(full_c), jnp.asarray(lb),
        jnp.asarray(ub), max_iter, interpret=interpret, group=group)

    # accurate recovery via the shared final-solution path (float32 LU)
    basis_j = jnp.asarray(basis)
    in_basis = jnp.zeros((Bp, NT), bool).at[
        jnp.arange(Bp)[:, None], basis_j].set(True)
    lbj = jnp.where(jnp.asarray(lb) <= -BIG, -jnp.inf, jnp.asarray(lb))
    ubj = jnp.where(jnp.asarray(ub) >= BIG, jnp.inf, jnp.asarray(ub))
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
                       np.asarray(iters)[:B], np.asarray(basis)[:B])


@jax.jit
def _final_jit(A, c, lb, ub, st):
    return sx._final_solutions(A, c, lb, ub, st)

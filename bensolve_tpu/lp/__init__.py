"""LP backends: batched tableau simplex (square-ish problems), batched
revised simplex (tall problems, N >> M), per-LP Pallas kernel."""


def solve_batch_auto(A, c, row_lb, row_ub, col_lb, col_ub, **kw):
    """Route a batch of LPs to the best backend (the role of GLPK's
    glp_simplex dispatch behind lp_solve, bslv_lp.c:219):

    * tall problems (N >= REVISED_RATIO * M): revised simplex — the
      tableau would carry (M+N)/M x more state per instance;
    * float32 square-ish problems on a TPU backend: the Pallas kernel
      (whole tableau resident in VMEM, grouped grid); anything it cannot
      take (f64, huge M+N, warm-start shapes it lacks) falls through;
    * otherwise: the XLA lockstep tableau solver.

    ``mesh`` (Options.mesh_axes): multi-chip sharding — routes to the
    revised/tableau SPMD paths (the single-core Pallas kernel is skipped).
    """
    import numpy as np

    from bensolve_tpu.lp import revised, simplex

    if isinstance(A, simplex._PreparedA):
        M, N = A.M, A.N
    else:
        M, N = np.asarray(A).shape
    mesh = kw.get("mesh")
    # Options.lp_ipm_min (native routing) takes effect alongside the
    # BENSOLVE_IPM_MIN env var: whichever enables the route wins
    ipm_min = kw.pop("ipm_min", 0) or (1 << 62)
    warm_interior = kw.pop("warm_interior", None)
    if mesh is None and M + N >= min(ipm_min, _ipm_min_size()):
        # huge instances: the per-pivot while-loop floor (~ms/step on
        # the TPU runtime, whatever M) makes every simplex variant
        # pivot-count-bound; the Mehrotra IPM solves in ~15-40 MXU
        # iterations independent of degeneracy (lp/ipm.py)
        from bensolve_tpu.lp import ipm

        ipm_kw = {}
        if "max_iter" in kw:
            ipm_kw["max_iter"] = kw["max_iter"]
        return ipm.solve_batch_ipm(A, c, row_lb, row_ub, col_lb, col_ub,
                                   dtype=kw.get("dtype", np.float64),
                                   verbose=kw.get("verbose", 0),
                                   warm_interior=warm_interior, **ipm_kw)
    if N >= revised.REVISED_RATIO * M:
        return revised.solve_batch_revised(A, c, row_lb, row_ub,
                                           col_lb, col_ub, **kw)
    kw.pop("mesh", None)
    kw.pop("verbose", None)
    if mesh is None and _pallas_eligible(M, N, kw):
        from bensolve_tpu.lp import pallas_simplex

        res = pallas_simplex.try_solve_batch(A, c, row_lb, row_ub,
                                             col_lb, col_ub, **kw)
        if res is not None:
            return res
    return simplex.solve_batch(A, c, row_lb, row_ub, col_lb, col_ub,
                               mesh=mesh, **kw)


def ensure_compile_cache() -> None:
    """Enable jax's persistent compilation cache unless one is already
    configured: a single large-program compile takes minutes on the
    remote-compilation TPU backend (measured 552 s for the ex09-scale
    IPM loop), and every entry point — CLI, library, direct backend
    calls — must hit the same cache.  BENSOLVE_CACHE_DIR overrides the
    location; set it empty to disable."""
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = os.environ.get("BENSOLVE_CACHE_DIR", "/tmp/jax_cache")
    if not path:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _ipm_min_size() -> int:
    """M+N above which solve_batch_auto routes to the interior-point
    backend.  Opt-in: the route is DISABLED unless BENSOLVE_IPM_MIN is
    set to a positive threshold (0 also disables).  The simplex family
    remains the default production path for every size; callers that
    want the IPM at scale (e.g. the ex09 flow) set the env knob or call
    ipm.solve_batch_ipm directly."""
    import os

    v = os.environ.get("BENSOLVE_IPM_MIN")
    if v:
        n = int(v)
        return n if n > 0 else 1 << 62
    return 1 << 62


def _pallas_eligible(M: int, N: int, kw) -> bool:
    """Cheap static gate before importing the Pallas path: f32 request
    on a real TPU backend (or BENSOLVE_FORCE_PALLAS=1, which runs the
    kernel in interpret mode — the CPU e2e test hook), tableau small
    enough for VMEM residence."""
    import os

    import numpy as np

    if np.dtype(kw.get("dtype", np.float64)) != np.dtype(np.float32):
        return False
    forced = os.environ.get("BENSOLVE_FORCE_PALLAS") == "1"
    if not forced:
        try:
            import jax

            if jax.default_backend() != "tpu":
                return False
        except Exception:
            return False
    from bensolve_tpu.lp import pallas_simplex

    return pallas_simplex.shape_supported(M, N)

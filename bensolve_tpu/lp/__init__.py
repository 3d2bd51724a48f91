"""LP backends: batched tableau simplex (square-ish problems), batched
revised simplex (tall problems, N >> M), per-LP Pallas kernel."""


def solve_batch_auto(A, c, row_lb, row_ub, col_lb, col_ub, **kw):
    """Route to the tableau or revised solver by aspect ratio: the
    tableau carries (M+N)/M x more state per instance, so tall problems
    (N >= REVISED_RATIO * M) go to the revised solver."""
    import numpy as np

    from bensolve_tpu.lp import revised, simplex

    M, N = np.asarray(A).shape
    if N >= revised.REVISED_RATIO * M:
        return revised.solve_batch_revised(A, c, row_lb, row_ub,
                                           col_lb, col_ub, **kw)
    return simplex.solve_batch(A, c, row_lb, row_ub, col_lb, col_ub, **kw)

"""Benson-oracle LP templates P2 and P1 as batched dense LPs.

The reference re-parameterizes ONE GLPK instance in place per iteration
(init_P2 bslv_algs.c:562-664, init_P1 bslv_algs.c:1186-1238).  Here each
template is an immutable dense matrix plus base bounds; per-candidate
data (the upper row bounds Z'v for P2, the objective w for P1) comes in
as a batch, and the whole frontier is solved in one device call.

Template P2(v) (homogeneous/inhomogeneous), variables (x, y, z):

    min z   s.t.  row bounds  on A x                  (m rows)
                  -P x + y  == 0                      (q rows)
                  ZR'y - (ZR'c) z <= ZR'v             (p rows, ZR'c = 1)
                  eta'y <= 1 (hom) / free (inhom)     (1 row)

Template P1(w), variables (x, y):

    min w'y s.t.  row bounds on A x                   (m rows)
                  -P x + y == 0                       (q rows)
                  eta'y <= 1 (hom) / free (inhom)     (1 row)

A 'u' row with ub = +inf is a free row, which subsumes every bound
pattern the reference pokes into the extra rows (one-hot init loops,
disabled eta row for pre-image passes).
"""

from __future__ import annotations

import numpy as np

from bensolve_tpu.lp import simplex, solve_batch_auto
from bensolve_tpu.lp.simplex import LPResult
from bensolve_tpu.vlp.problem import VLPProblem

HOMOGENEOUS = True
INHOMOGENEOUS = False


class _TemplateBase:
    def __init__(self, vlp: VLPProblem, P_eff: np.ndarray, homogeneous: bool,
                 dtype=np.float64):
        self.dtype = np.dtype(dtype).type
        self.vlp = vlp
        self.m, self.n, self.q = vlp.m, vlp.n, vlp.q
        self.P_eff = P_eff
        rows = vlp.rows.homogeneous() if homogeneous else vlp.rows
        cols = vlp.cols.homogeneous() if homogeneous else vlp.cols
        self.row_lb_vlp, self.row_ub_vlp = rows.lb, rows.ub
        self.col_lb_vlp, self.col_ub_vlp = cols.lb, cols.ub
        self.homogeneous = homogeneous
        # shared warm-start basis carried across Benson rounds (the
        # batched analogue of GLPK's in-place warm start)
        self._warm = None

    def _run(self, A_lp, obj, row_lb, row_ub, col_lb, col_ub) -> LPResult:
        res = solve_batch_auto(A_lp, obj, row_lb, row_ub, col_lb, col_ub,
                               start_basis=self._warm, dtype=self.dtype)
        ok = np.flatnonzero(res.status == simplex.OPTIMAL)
        if ok.size and res.basis is not None:
            # carry basis AND nonbasic bound pattern into the next round
            self._warm = (res.basis[int(ok[0])], res.at_upper[int(ok[0])])
        return res

    def _vlp_blocks(self):
        """Rows [A 0...], [-P I 0...] and their bounds; y columns free."""
        m, n, q = self.m, self.n, self.q
        vlp = self.vlp
        top = np.concatenate([vlp.A, np.zeros((m, q))], axis=1)
        mid = np.concatenate([-self.P_eff, np.eye(q)], axis=1)
        return top, mid


class P2Template(_TemplateBase):
    def __init__(self, vlp, P_eff, ZR: np.ndarray, eta: np.ndarray,
                 homogeneous: bool, dtype=np.float64):
        super().__init__(vlp, P_eff, homogeneous, dtype)
        m, n, q = self.m, self.n, self.q
        ZR = np.asarray(ZR, float)
        self.p = ZR.shape[1]
        self.ZR = ZR
        top, mid = self._vlp_blocks()
        # add the z column
        top = np.concatenate([top, np.zeros((m, 1))], axis=1)
        mid = np.concatenate([mid, np.zeros((q, 1))], axis=1)
        zrow = np.concatenate(
            [np.zeros((self.p, n)), ZR.T, -np.ones((self.p, 1))], axis=1)
        erow = np.concatenate(
            [np.zeros((1, n)), np.asarray(eta, float)[None, :],
             np.zeros((1, 1))], axis=1)
        self.A_lp = np.concatenate([top, mid, zrow, erow])  # (m+q+p+1, n+q+1)
        self.obj = np.zeros(n + q + 1)
        self.obj[n + q] = 1.0
        self.col_lb = np.concatenate(
            [self.col_lb_vlp, np.full(q + 1, -np.inf)])
        self.col_ub = np.concatenate(
            [self.col_ub_vlp, np.full(q + 1, np.inf)])

    def solve(self, extra_ub: np.ndarray,
              eta_ub: float | np.ndarray | None = None) -> LPResult:
        """``extra_ub``: (B, p) upper bounds ZR'v (+inf rows inactive);
        ``eta_ub``: bound of the eta row (default: 1 hom / +inf inhom)."""
        extra_ub = np.atleast_2d(np.asarray(extra_ub, float))
        B = extra_ub.shape[0]
        if eta_ub is None:
            eta_ub = 1.0 if self.homogeneous else np.inf
        eta_ub = np.broadcast_to(np.asarray(eta_ub, float), (B,))

        m, q, p = self.m, self.q, self.p
        row_lb = np.concatenate([
            np.broadcast_to(self.row_lb_vlp, (B, m)),
            np.zeros((B, q)),
            np.full((B, p + 1), -np.inf)], axis=1)
        row_ub = np.concatenate([
            np.broadcast_to(self.row_ub_vlp, (B, m)),
            np.zeros((B, q)),
            extra_ub,
            eta_ub[:, None]], axis=1)
        return self._run(
            self.A_lp, np.broadcast_to(self.obj, (B, self.obj.size)),
            row_lb, row_ub,
            np.broadcast_to(self.col_lb, (B, self.col_lb.size)),
            np.broadcast_to(self.col_ub, (B, self.col_ub.size)))

    # result accessors (index maps mirror the reference getter calls)
    def duals_w(self, res: LPResult) -> np.ndarray:
        """Row duals of the q coupling rows -Px+y=0 (rows m+1..m+q)."""
        return res.row_dual[:, self.m:self.m + self.q]

    def duals_alpha(self, res: LPResult) -> np.ndarray:
        """Row dual of the eta row (row m+q+p+1)."""
        return res.row_dual[:, self.m + self.q + self.p]

    def duals_u(self, res: LPResult) -> np.ndarray:
        """Row duals of the m VLP rows (the dual pre-image u)."""
        return res.row_dual[:, : self.m]

    def primal_x(self, res: LPResult) -> np.ndarray:
        return res.x[:, : self.n]

    def primal_y(self, res: LPResult) -> np.ndarray:
        return res.x[:, self.n:self.n + self.q]


class P1Template(_TemplateBase):
    def __init__(self, vlp, P_eff, eta: np.ndarray, homogeneous: bool,
                 dtype=np.float64):
        super().__init__(vlp, P_eff, homogeneous, dtype)
        m, n, q = self.m, self.n, self.q
        top, mid = self._vlp_blocks()
        erow = np.concatenate(
            [np.zeros((1, n)), np.asarray(eta, float)[None, :]], axis=1)
        self.A_lp = np.concatenate([top, mid, erow])  # (m+q+1, n+q)
        self.col_lb = np.concatenate([self.col_lb_vlp, np.full(q, -np.inf)])
        self.col_ub = np.concatenate([self.col_ub_vlp, np.full(q, np.inf)])

    def solve(self, w_batch: np.ndarray,
              eta_ub: float | np.ndarray | None = None) -> LPResult:
        """``w_batch``: (B, q) objective weights on the y variables."""
        w_batch = np.atleast_2d(np.asarray(w_batch, float))
        B = w_batch.shape[0]
        if eta_ub is None:
            eta_ub = 1.0 if self.homogeneous else np.inf
        eta_ub = np.broadcast_to(np.asarray(eta_ub, float), (B,))

        m, n, q = self.m, self.n, self.q
        obj = np.concatenate([np.zeros((B, n)), w_batch], axis=1)
        row_lb = np.concatenate([
            np.broadcast_to(self.row_lb_vlp, (B, m)),
            np.zeros((B, q)),
            np.full((B, 1), -np.inf)], axis=1)
        row_ub = np.concatenate([
            np.broadcast_to(self.row_ub_vlp, (B, m)),
            np.zeros((B, q)),
            eta_ub[:, None]], axis=1)
        return self._run(
            self.A_lp, obj, row_lb, row_ub,
            np.broadcast_to(self.col_lb, (B, self.col_lb.size)),
            np.broadcast_to(self.col_ub, (B, self.col_ub.size)))

    def primal_x(self, res: LPResult) -> np.ndarray:
        return res.x[:, : self.n]

    def primal_y(self, res: LPResult) -> np.ndarray:
        return res.x[:, self.n:self.n + self.q]

    def duals_u(self, res: LPResult) -> np.ndarray:
        """Row duals of the m VLP rows — the dual pre-image u.

        Deviation from the reference: phase2_dual reads COLUMN duals
        1..m for u (bslv_algs.c:1497, lp_dual_solution_cols), which
        indexes reduced costs of x variables and is wrong whenever
        m != n (and aborts when m > n+q); the row duals are the actual
        multipliers of the A-rows.  We implement the correct math."""
        return res.row_dual[:, : self.m]

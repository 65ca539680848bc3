"""Presolve: cheap problem reductions before the device solve.

The reference reaches presolve through scipy (``presolve: True``,
``solver_controller.py:76``); this is the in-framework equivalent.  Only
reductions whose POSTSOLVE is trivial are performed, so solution values,
shadow prices, and reduced costs map back exactly:

* empty rows        — ``0 (op) b``: dropped when trivially satisfied,
                      infeasibility detected otherwise (dual = 0);
* empty columns     — a variable in no constraint: fixed at 0 when its
                      min-form cost is nonnegative (reduced cost = user
                      cost); improving empty columns are KEPT — they mean
                      "unbounded if feasible", and feasibility is the
                      engine's phase-1 call, not presolve's;
* redundant bounds  — singleton rows implied by ``x >= 0``
                      (``a x_j >= b`` with ``a > 0 >= b``, etc.): dropped
                      (dual = 0); singleton rows that contradict
                      ``x >= 0`` prove infeasibility immediately.

Substitution-style reductions (fixed variables, doubleton elimination)
are deliberately left out: they would remap duals nontrivially and the
device engines handle those rows at full speed anyway.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .problem import LinearProgram, OP_EQ, OP_GE, OP_LE


@dataclasses.dataclass
class PresolveResult:
    """Outcome of presolve on one LP."""

    lp: Optional[LinearProgram]      # reduced problem (None if decided)
    status: Optional[int]            # 2/3 when presolve decides the LP
    kept_rows: np.ndarray            # original row index per kept row
    kept_cols: np.ndarray            # original col index per kept col
    n_rows_orig: int
    n_cols_orig: int

    @property
    def decided(self) -> bool:
        return self.status is not None

    @property
    def reduced(self) -> bool:
        return (len(self.kept_rows) < self.n_rows_orig
                or len(self.kept_cols) < self.n_cols_orig)

    # ------------------------------------------------------------------ #
    def postsolve_x(self, x_red: np.ndarray) -> np.ndarray:
        """Map reduced-problem variables back (dropped columns are 0)."""
        x = np.zeros((self.n_cols_orig,))
        x[self.kept_cols] = x_red
        return x

    def postsolve_duals(self, duals_red: Optional[np.ndarray]
                        ) -> Optional[np.ndarray]:
        """Dropped rows are non-binding by construction: dual 0."""
        if duals_red is None:
            return None
        y = np.zeros((self.n_rows_orig,))
        y[self.kept_rows] = duals_red
        return y

    def postsolve_reduced_costs(self, rc_red: Optional[np.ndarray],
                                lp_orig: LinearProgram
                                ) -> Optional[np.ndarray]:
        """Dropped columns touch no constraint: rc = user-sense cost."""
        if rc_red is None:
            return None
        rc = np.zeros((self.n_cols_orig,))
        rc[self.kept_cols] = rc_red
        dropped = np.setdiff1d(np.arange(self.n_cols_orig), self.kept_cols)
        user_sign = -1.0 if lp_orig.maximize else 1.0
        # dZ_user/dx_j for an unconstrained-at-zero variable is its own
        # user-sense cost mapped through the reporting convention
        # (user_sign * min-form cost = the original c_j either way).
        rc[dropped] = user_sign * (
            -lp_orig.c[dropped] if lp_orig.maximize else lp_orig.c[dropped])
        return rc


def presolve(lp: LinearProgram, tol: float = 1e-9) -> PresolveResult:
    """Apply the safe reductions.  Never raises on a well-formed LP."""
    m, n = lp.n_cons, lp.n_vars
    A = np.asarray(lp.A, np.float64)
    b = np.asarray(lp.b, np.float64)
    ops = np.asarray(lp.ops)
    c_min = -np.asarray(lp.c, np.float64) if lp.maximize \
        else np.asarray(lp.c, np.float64)

    def decided(status: int) -> PresolveResult:
        return PresolveResult(lp=None, status=status,
                              kept_rows=np.arange(m),
                              kept_cols=np.arange(n),
                              n_rows_orig=m, n_cols_orig=n)

    keep_row = np.ones((m,), bool)
    nz = np.abs(A) > tol
    row_nnz = nz.sum(axis=1)

    # ---- empty rows: 0 (op) b ------------------------------------------ #
    for i in np.where(row_nnz == 0)[0]:
        ok = ((ops[i] == OP_LE and b[i] >= -tol)
              or (ops[i] == OP_GE and b[i] <= tol)
              or (ops[i] == OP_EQ and abs(b[i]) <= tol))
        if not ok:
            return decided(2)
        keep_row[i] = False

    # ---- singleton rows vs x >= 0 -------------------------------------- #
    for i in np.where(row_nnz == 1)[0]:
        j = int(np.argmax(nz[i]))
        a = A[i, j]
        bound = b[i] / a
        if ops[i] == OP_LE:
            # a*x_j <= b  ->  x_j <= bound (a>0) / x_j >= bound (a<0)
            if a > 0 and bound < -tol:
                return decided(2)          # x_j <= negative: empty
            if a < 0 and bound <= tol:
                keep_row[i] = False        # x_j >= nonpositive: implied
        elif ops[i] == OP_GE:
            if a > 0 and bound <= tol:
                keep_row[i] = False        # x_j >= nonpositive: implied
            if a < 0 and bound < -tol:
                return decided(2)          # x_j <= negative: empty
        else:                              # a*x_j = b
            if bound < -tol:
                return decided(2)          # x_j = negative: empty

    # ---- empty columns -------------------------------------------------- #
    # An improving (c_min < 0) empty column means "unbounded IF feasible" —
    # feasibility of the remaining rows is not known here, so those columns
    # are KEPT and the two-phase engine decides (phase 1 feasibility first,
    # then the ratio test flags the empty column as unbounded).  Only
    # never-improving empty columns are safely fixed at zero.
    keep_col = np.ones((n,), bool)
    col_nnz = nz[keep_row].sum(axis=0) if keep_row.any() \
        else np.zeros((n,), np.int64)
    for j in np.where(col_nnz == 0)[0]:
        if c_min[j] >= -tol:
            keep_col[j] = False            # optimal at 0

    kept_rows = np.where(keep_row)[0]
    kept_cols = np.where(keep_col)[0]

    if len(kept_cols) == 0:
        # Everything fixed at zero; remaining rows must accept x = 0.
        for i in kept_rows:
            ok = ((ops[i] == OP_LE and b[i] >= -tol)
                  or (ops[i] == OP_GE and b[i] <= tol)
                  or (ops[i] == OP_EQ and abs(b[i]) <= tol))
            if not ok:
                return decided(2)
        kept_rows = np.array([], dtype=np.int64)

    lp_red = LinearProgram(
        c=lp.c[kept_cols],
        A=A[np.ix_(kept_rows, kept_cols)] if len(kept_rows) else
          np.zeros((0, len(kept_cols))),
        b=b[kept_rows],
        ops=ops[kept_rows],
        maximize=lp.maximize,
        variables=[lp.variables[j] for j in kept_cols],
    )
    return PresolveResult(lp=lp_red, status=None,
                          kept_rows=kept_rows, kept_cols=kept_cols,
                          n_rows_orig=m, n_cols_orig=n)


@dataclasses.dataclass
class Equilibration:
    """Inverse map of :func:`equilibrate` (Ruiz row/column scaling).

    The scaled LP is ``A~ = diag(r) A diag(s)``, ``b~ = r∘b``,
    ``c~ = s∘c``, ``lb~ = lb/s``, ``ub~ = ub/s`` with ``x = s∘x'`` — the
    objective VALUE is preserved exactly (``c~·x' = c·x``), shadow prices
    map as ``y = r∘y~`` (``b~ = r∘b`` ⇒ ``dZ/db = r·dZ/db~``) and reduced
    costs as ``rc = rc~/s``.
    """

    r: np.ndarray                    # (m,) row scales
    s: np.ndarray                    # (n,) column scales

    @property
    def identity(self) -> bool:
        return bool(np.all(self.r == 1.0) and np.all(self.s == 1.0))

    def restore_x(self, x: np.ndarray) -> np.ndarray:
        return self.s * np.asarray(x, np.float64)

    def restore_duals(self, y: Optional[np.ndarray]) -> Optional[np.ndarray]:
        return None if y is None else self.r * np.asarray(y, np.float64)

    def restore_reduced(self, rc: Optional[np.ndarray]
                        ) -> Optional[np.ndarray]:
        return None if rc is None else np.asarray(rc, np.float64) / self.s


def coefficient_range(A: np.ndarray) -> float:
    """max|a|/min|a| over nonzeros — the spread equilibration targets."""
    absA = np.abs(np.asarray(A, np.float64))
    nz = absA[absA > 0]
    if nz.size == 0:
        return 1.0
    return float(np.max(nz) / np.min(nz))


def equilibrate(lp: LinearProgram,
                threshold: float = 1e3):
    """Ruiz row/column equilibration of badly-scaled LPs.

    Netlib-style coefficient spreads of 1e±4 stall f32 simplex engines
    (pricing noise swamps genuine reduced costs; tiny pivots go singular
    — the round-4 adversarial corpus measured 100k+ iterations without
    convergence unscaled, ~2k scaled).  HiGHS does the same internally
    behind the reference's ``solver_controller.py:78-85``.

    Returns ``(lp_scaled, Equilibration)``; identity when the coefficient
    range is already under ``threshold``.  Scaling is row-only (see the
    in-function note): ``s`` stays 1, so ``x``/``rc``/bounds are
    untouched and only duals need restoring.  Row scaling is exact in f32
    binary arithmetic terms (scales are free-form floats, not powers of
    two — the f64 certification re-checks everything downstream anyway).
    """
    A = np.asarray(lp.A, np.float64)
    m, n = A.shape
    ident = Equilibration(r=np.ones(m), s=np.ones(n))
    if m == 0 or n == 0 or coefficient_range(A) <= threshold:
        return lp, ident

    # ROW-ONLY scaling (infinity-norm): each row is divided by its max
    # |entry|, so b scales with it and the variable space (costs, bounds,
    # reduced costs) is untouched.  Column scaling was measured to HURT
    # the f32 engines on the adversarial corpus: it multiplies costs and
    # divides bounds by up to 1e2, pushing genuine reduced costs below
    # the fixed pricing tolerance and creating near-fixed variables —
    # instances that solved in ~2k pivots unscaled ran 100k+ with Ruiz
    # row+column scaling (round-4 bisection: row-only kept every win).
    s = np.ones(n)
    As = A.copy()
    with np.errstate(divide="ignore"):
        row_max = np.max(np.abs(As), axis=1)
        r = np.where(row_max > 0, 1.0 / row_max, 1.0)
    As *= r[:, None]

    lb2 = np.where(np.isfinite(lp.lb), lp.lb / s, lp.lb)
    ub2 = np.where(np.isfinite(lp.ub), lp.ub / s, lp.ub)
    lp2 = LinearProgram(c=lp.c * s, A=As, b=lp.b * r, ops=lp.ops.copy(),
                        maximize=lp.maximize,
                        variables=list(lp.variables), lb=lb2, ub=ub2)
    return lp2, Equilibration(r=r, s=s)

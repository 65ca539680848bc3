"""Presolve reductions (the reference's scipy ``presolve: True`` role,
``solver_controller.py:76``) with exact postsolve of x, duals, and
reduced costs."""
import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu import LinearProgram, solve_lp
from simplex_tpu.core.presolve import presolve


def test_reductions_with_postsolved_sensitivity():
    # rows: 3 real + 1 empty satisfiable + 1 singleton implied by x>=0;
    # column 3 appears in no constraint (cost keeps it at zero).
    lp = LinearProgram(
        c=[3, 5, -2],
        A=[[1, 0, 0], [0, 2, 0], [3, 2, 0], [0, 0, 0], [-1, 0, 0]],
        b=[4, 12, 18, 5, 1],
        ops=[-1, -1, -1, -1, -1],
        maximize=True)
    pr = presolve(lp)
    assert not pr.decided and pr.reduced
    assert len(pr.kept_rows) == 3 and len(pr.kept_cols) == 2

    r = solve_lp(lp)
    assert r.success and abs(r.z - 36.0) < 1e-6
    assert abs(r.x[2]) < 1e-9
    assert r.duals.shape == (5,)
    assert r.duals[3] == 0.0 and r.duals[4] == 0.0     # dropped rows
    assert abs(r.duals[1] - 1.5) < 1e-6 and abs(r.duals[2] - 1.0) < 1e-6
    assert abs(r.reduced_costs[2] - (-2.0)) < 1e-9     # dropped column


def test_presolve_decides_infeasible_and_unbounded():
    # 0·x <= -1: empty row contradiction.
    r = solve_lp(LinearProgram(c=[1], A=[[0.0]], b=[-1.0], ops=[-1],
                               maximize=False))
    assert r.status == 2

    # x2 in no constraint with improving cost: unbounded.
    r = solve_lp(LinearProgram(c=[1, 1], A=[[1, 0]], b=[4], ops=[-1],
                               maximize=True))
    assert r.status == 3

    # singleton equality forcing x1 = -2 < 0.
    r = solve_lp(LinearProgram(c=[1, 1], A=[[1, 0], [1, 1]], b=[-2, 5],
                               ops=[0, -1], maximize=False))
    assert r.status == 2


def test_presolve_agrees_with_scipy_on_random_sparse():
    rng = np.random.default_rng(99)
    for _ in range(40):
        m, n = int(rng.integers(2, 8)), int(rng.integers(2, 8))
        A = rng.normal(size=(m, n)).round(2)
        A[rng.random(size=(m, n)) < 0.6] = 0.0        # sparse: triggers
        b = rng.uniform(-3, 6, size=m).round(2)       # empty/singleton rows
        c = rng.normal(size=n).round(2)
        ops = rng.choice([-1, 0, 1], size=m)
        lp = LinearProgram(c=c, A=A, b=b, ops=ops,
                           maximize=bool(rng.integers(0, 2)))
        A_ub, b_ub, A_eq, b_eq = [], [], [], []
        for i in range(m):
            if ops[i] == -1:
                A_ub.append(A[i]); b_ub.append(b[i])
            elif ops[i] == 1:
                A_ub.append(-A[i]); b_ub.append(-b[i])
            else:
                A_eq.append(A[i]); b_eq.append(b[i])
        cs = c * (-1 if lp.maximize else 1)
        ref = linprog(cs, A_ub=A_ub or None, b_ub=b_ub or None,
                      A_eq=A_eq or None, b_eq=b_eq or None,
                      method="highs", options={"presolve": False})
        if ref.status == 4:
            continue
        r = solve_lp(lp)
        assert r.status == ref.status, (r.status, ref.status)
        if ref.status == 0:
            zref = -ref.fun if lp.maximize else ref.fun
            assert abs(r.z - zref) <= 1e-5 * (1 + abs(zref))


def test_duplicate_rows_dropped_keeping_tightest():
    """Proportional rows (round-5): only the tightest survives; optimum,
    duals on the kept row, and scipy parity are unchanged."""
    from simplex_tpu.core.presolve import presolve

    A = np.array([[1.0, 2.0],
                  [2.0, 4.0],      # 2x row 0, looser (b: 10 vs 2*4=8... )
                  [0.5, 1.0],      # 0.5x row 0
                  [1.0, 0.0]])
    b = np.array([4.0, 10.0, 1.5, 3.0])   # row 2 is tightest (norm b=1.5/1=1.5... )
    lp = LinearProgram(c=[3.0, 5.0], A=A, b=b, ops=[-1, -1, -1, -1],
                       maximize=True)
    pr = presolve(lp)
    assert pr.reduced and not pr.decided
    # Rows 0,1,2 are proportional; exactly one survives + row 3.
    assert len(pr.kept_rows) == 2 and 3 in pr.kept_rows
    res = solve_lp(lp)
    ref = linprog([-3.0, -5.0], A_ub=A, b_ub=b, method="highs")
    assert res.success and ref.status == 0
    assert res.z == pytest.approx(-ref.fun, rel=1e-8)


def test_duplicate_eq_rows_inconsistent_infeasible():
    from simplex_tpu.core.presolve import presolve

    lp = LinearProgram(c=[1.0, 1.0],
                       A=[[1.0, 1.0], [2.0, 2.0]],
                       b=[1.0, 3.0], ops=[0, 0], maximize=False)
    pr = presolve(lp)
    assert pr.decided and pr.status == 2
    res = solve_lp(lp)
    assert not res.success and res.status == 2


def test_negated_eq_duplicate_detected():
    """A_k = -A_i equality rows are the same constraint after sign
    canonicalization."""
    from simplex_tpu.core.presolve import presolve

    lp = LinearProgram(c=[1.0, 2.0],
                       A=[[1.0, -1.0], [-2.0, 2.0], [1.0, 1.0]],
                       b=[0.5, -1.0, 4.0], ops=[0, 0, -1], maximize=True)
    pr = presolve(lp)
    assert pr.reduced and len(pr.kept_rows) == 2
    res = solve_lp(lp)
    ref = linprog([-1.0, -2.0], A_ub=[[1.0, 1.0]], b_ub=[4.0],
                  A_eq=[[1.0, -1.0]], b_eq=[0.5], method="highs")
    assert res.success and ref.status == 0
    assert res.z == pytest.approx(-ref.fun, rel=1e-8)


def test_dominated_columns_fixed_at_zero():
    """A column that never pays and never helps feasibility is dropped;
    its reduced cost is reconstructed from the duals (rc = c - y A_j)."""
    from simplex_tpu.core.presolve import presolve

    # min x0 + 4 x1 - x2  s.t. x0 + x2 >= 2, x1 only CONSUMES <= slack.
    A = np.array([[-1.0, 0.0, -1.0],     # >= flipped as <=: -(x0+x2) <= -2
                  [1.0, 1.0, 1.0]])
    lp = LinearProgram(c=[1.0, 4.0, -1.0], A=[[1.0, 0.0, 1.0],
                                              [1.0, 1.0, 1.0]],
                       b=[2.0, 5.0], ops=[1, -1], maximize=False)
    pr = presolve(lp)
    assert pr.reduced
    assert 1 not in pr.kept_cols          # x1: c_min>0, helps nothing
    res = solve_lp(lp)
    ref = linprog([1.0, 4.0, -1.0], A_ub=[[-1.0, 0.0, -1.0],
                                          [1.0, 1.0, 1.0]],
                  b_ub=[-2.0, 5.0], method="highs")
    assert res.success and ref.status == 0
    assert res.z == pytest.approx(ref.fun, rel=1e-8)
    assert res.x[1] == pytest.approx(0.0, abs=1e-9)
    # rc of the dropped column from duals: c_1 - y·A[:,1].
    if res.reduced_costs is not None and res.duals is not None:
        expect = 4.0 - res.duals @ np.array([0.0, 1.0])
        assert res.reduced_costs[1] == pytest.approx(expect, abs=1e-7)


def test_presolve_reduces_pivots_on_redundant_lp():
    """Measured pivot reduction (VERDICT r4 item 9 'done' criterion): an
    LP padded with duplicate rows and dominated columns must solve with
    no more pivots than its padded self without presolve, at parity."""
    import dataclasses as dc
    from simplex_tpu.config import SolverConfig

    rng = np.random.default_rng(5)
    m, n = 12, 10
    A_core = rng.uniform(0.1, 1.0, (m, n))
    b_core = rng.uniform(2.0, 6.0, m)
    c = rng.uniform(0.1, 1.0, n)
    # Pad: every row duplicated at 2x scale (looser), plus 6 dominated
    # columns (positive cost, only consuming <= slack).
    A = np.vstack([A_core, 2.0 * A_core])
    b = np.concatenate([b_core, 2.0 * b_core + 1.0])
    A = np.hstack([A, rng.uniform(0.1, 1.0, (2 * m, 6))])
    c_full = np.concatenate([c, -rng.uniform(0.5, 1.0, 6)])  # max: cost<0
    lp = LinearProgram(c=c_full, A=A, b=b, ops=np.full(2 * m, -1),
                       maximize=True)
    res_pre = solve_lp(lp, SolverConfig(presolve=True))
    res_raw = solve_lp(lp, SolverConfig(presolve=False))
    ref = linprog(-c_full, A_ub=A, b_ub=b, method="highs")
    assert res_pre.success and res_raw.success and ref.status == 0
    assert res_pre.z == pytest.approx(-ref.fun, rel=1e-7)
    assert res_raw.z == pytest.approx(-ref.fun, rel=1e-7)
    assert res_pre.nit <= res_raw.nit

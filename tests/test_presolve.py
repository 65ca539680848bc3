"""Presolve reductions (the reference's scipy ``presolve: True`` role,
``solver_controller.py:76``) with exact postsolve of x, duals, and
reduced costs."""
import numpy as np
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

"""MPS reader + netlib-style LP tests (BASELINE config 4 coverage)."""
import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu import solve_lp
from simplex_tpu.models.revised import RevisedSimplexSolver
from simplex_tpu.utils.mps import (
    generate_netlib_style,
    parse_mps,
)

TESTPROB = """NAME          TESTPROB
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    X1        COST         1.0   LIM1         1.0
    X1        LIM2         1.0
    X2        COST         2.0   LIM1         1.0
    X2        MYEQN       -1.0
    X3        COST        -1.0   MYEQN        1.0
RHS
    RHS       LIM1         4.0   LIM2         1.0
    RHS       MYEQN        7.0
BOUNDS
 UP BND       X1           4.0
 LO BND       X2           1.0
ENDATA
"""


def test_parse_mps_structure():
    lp = parse_mps(TESTPROB)
    assert lp.n_vars == 3
    # 3 rows + UP bound row + LO bound row
    assert lp.n_cons == 5
    assert lp.ops.tolist() == [-1, 1, 0, -1, 1]
    assert lp.c.tolist() == [1.0, 2.0, -1.0]


def test_parse_mps_solve_matches_scipy():
    lp = parse_mps(TESTPROB)
    r = solve_lp(lp)
    ref = linprog([1, 2, -1],
                  A_ub=[[1, 1, 0], [-1, 0, 0], [1, 0, 0], [0, -1, 0]],
                  b_ub=[4, -1, 4, -1],
                  A_eq=[[0, -1, 1]], b_eq=[7], method="highs")
    assert r.status == ref.status == 0
    assert r.z == pytest.approx(ref.fun, rel=1e-8)


def test_parse_mps_rejects_free_variables():
    text = TESTPROB.replace(" UP BND       X1           4.0",
                            " FR BND       X1")
    with pytest.raises(ValueError, match="libres"):
        parse_mps(text)


def test_parse_mps_rejects_integer_markers():
    bad = TESTPROB.replace(
        "    X1        COST         1.0   LIM1         1.0",
        "    MARKER    'MARKER'     'INTORG'\n"
        "    X1        COST         1.0   LIM1         1.0",
    )
    with pytest.raises(ValueError, match="enteras"):
        parse_mps(bad)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_netlib_style_revised_matches_scipy(seed):
    lp = generate_netlib_style(seed, m=25, n=60)
    r = RevisedSimplexSolver().solve(lp)
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(lp.n_cons):
        if lp.ops[i] == -1:
            A_ub.append(lp.A[i]); b_ub.append(lp.b[i])
        elif lp.ops[i] == 1:
            A_ub.append(-lp.A[i]); b_ub.append(-lp.b[i])
        else:
            A_eq.append(lp.A[i]); b_eq.append(lp.b[i])
    ref = linprog(lp.c, A_ub=A_ub or None, b_ub=b_ub or None,
                  A_eq=A_eq or None, b_eq=b_eq or None, method="highs")
    assert r.status == ref.status
    if ref.status == 0:
        assert r.z == pytest.approx(ref.fun, rel=1e-5)


def test_netlib_style_large_parity_revised():
    """BASELINE config 4 at non-toy size: generated netlib-style LPs
    (n >> m regime) through the revised simplex, objective parity vs
    scipy/HiGHS to 1e-4 relative (achieved ~1e-13 in practice)."""
    for seed, (m, n) in [(1, (120, 400))]:
        lp = generate_netlib_style(seed, m=m, n=n)
        A_ub, b_ub, A_eq, b_eq = [], [], [], []
        for i in range(lp.n_cons):
            if lp.ops[i] == -1:
                A_ub.append(lp.A[i]); b_ub.append(lp.b[i])
            elif lp.ops[i] == 1:
                A_ub.append(-lp.A[i]); b_ub.append(-lp.b[i])
            else:
                A_eq.append(lp.A[i]); b_eq.append(lp.b[i])
        cs = lp.c * (-1 if lp.maximize else 1)
        ref = linprog(cs, A_ub=A_ub or None, b_ub=b_ub or None,
                      A_eq=A_eq or None, b_eq=b_eq or None, method="highs")
        r = RevisedSimplexSolver().solve(lp)
        assert ref.status == 0 and r.status == 0
        zref = -ref.fun if lp.maximize else ref.fun
        assert abs(r.z - zref) < 1e-4 * (1 + abs(zref))

"""Native variable bounds: IR transforms + bounded revised simplex.

VERDICT r2 item 1: lb/ub live on the IR (``core.problem.LinearProgram``),
the revised engine consumes them through a bounded-variable ratio test
(nonbasic-at-upper states, bound flips — ``models/revised.py``), and MPS
BOUNDS sections no longer inflate m with dense rows.  Bound-unaware
engines lower explicitly (``lower_bounds_to_rows``).  Parity oracle:
scipy/HiGHS with the same native bounds — the exact capability the
reference reaches through ``linprog(bounds=...)``
(``solver_controller.py:78-85,163``).
"""
import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu import (
    LinearProgram,
    lower_bounds_to_rows,
    normalize_bounds,
    solve_lp,
    solve_lp_batch,
)
from simplex_tpu.models.revised import RevisedSimplexSolver
from simplex_tpu.utils.mps import parse_mps


def _scipy_ref(lp):
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(lp.n_cons):
        if lp.ops[i] == -1:
            A_ub.append(lp.A[i]); b_ub.append(lp.b[i])
        elif lp.ops[i] == 1:
            A_ub.append(-lp.A[i]); b_ub.append(-lp.b[i])
        else:
            A_eq.append(lp.A[i]); b_eq.append(lp.b[i])
    bounds = [(None if np.isneginf(l) else float(l),
               None if np.isinf(u) else float(u))
              for l, u in zip(lp.lb, lp.ub)]
    cs = -lp.c if lp.maximize else lp.c
    return linprog(cs, A_ub=A_ub or None, b_ub=b_ub or None,
                   A_eq=A_eq or None, b_eq=b_eq or None,
                   bounds=bounds, method="highs")


def _random_bounded_lp(seed: int) -> LinearProgram:
    rng = np.random.default_rng(seed)
    m, n = int(rng.integers(3, 9)), int(rng.integers(3, 11))
    A = rng.normal(size=(m, n)).round(2)
    x0 = rng.uniform(-1, 3, size=n)
    ops = rng.choice([-1, 0, 1], size=m, p=[0.6, 0.1, 0.3]).astype(np.int8)
    slack = rng.uniform(0.1, 1.0, size=m)
    b = A @ x0 + np.where(ops == -1, slack,
                          np.where(ops == 1, -slack, 0.0))
    c = rng.normal(size=n).round(2)
    kind = rng.integers(0, 5, size=n)
    lb = np.zeros(n)
    ub = np.full(n, np.inf)
    for j in range(n):
        if kind[j] == 1:
            lb[j] = -np.inf
        elif kind[j] == 2:                       # box around x0
            lb[j] = round(x0[j] - rng.uniform(0, 2), 2)
            ub[j] = round(x0[j] + rng.uniform(0, 2), 2)
        elif kind[j] == 3:                       # (-inf, u]
            lb[j], ub[j] = -np.inf, round(x0[j] + rng.uniform(0, 2), 2)
        elif kind[j] == 4:                       # [l, inf), l may be < 0
            lb[j] = round(x0[j] - rng.uniform(0, 2), 2)
    return LinearProgram(c=c, A=A, b=b, ops=ops,
                         maximize=bool(rng.integers(0, 2)), lb=lb, ub=ub)


# --------------------------------------------------------------------------- #
# IR transforms                                                               #
# --------------------------------------------------------------------------- #
def test_normalize_bounds_shift_flip_split():
    lp = LinearProgram(
        c=[1.0, 2.0, 3.0, 4.0],
        A=[[1.0, 1.0, 1.0, 1.0]],
        b=[10.0], ops=[-1], maximize=False,
        lb=[2.0, -np.inf, -np.inf, 0.0],
        ub=[5.0, 3.0, np.inf, np.inf],
    )
    lp2, tr = normalize_bounds(lp)
    # x1 shifted by 2 (ub' = 3); x2 flipped at 3; x3 stays free; x4 as-is.
    assert tr.shift.tolist() == [2.0, 3.0, 0.0, 0.0]
    assert tr.sign.tolist() == [1.0, -1.0, 1.0, 1.0]
    assert tr.z_offset == pytest.approx(1 * 2 + 2 * 3)
    assert lp2.lb.tolist() == [0.0, 0.0, -np.inf, 0.0]
    assert lp2.ub.tolist() == [3.0, np.inf, np.inf, np.inf]
    assert lp2.A[0].tolist() == [1.0, -1.0, 1.0, 1.0]
    assert lp2.b[0] == pytest.approx(10.0 - (1 * 2 + 1 * 3))
    # Point round-trip: any x' maps to an x with the same row activity.
    xp = np.array([1.0, 2.5, -4.0, 7.0])
    x = tr.restore_x(xp)
    assert np.allclose(lp.A @ x, lp2.A @ xp + lp.A @ tr.shift)
    assert lp.c @ x == pytest.approx(lp2.c @ xp + tr.z_offset)


def test_normalize_bounds_identity_for_pure_ub():
    lp = LinearProgram(c=[1.0], A=[[1.0]], b=[4.0], ops=[-1],
                       maximize=True, ub=[2.0])
    lp2, tr = normalize_bounds(lp)
    assert tr.identity
    assert lp2 is lp


def test_lower_bounds_to_rows_semantics():
    lp = LinearProgram(
        c=[1.0, 1.0, 1.0], A=[[1.0, 1.0, 1.0]], b=[10.0], ops=[-1],
        maximize=False, lb=[1.0, -2.0, 3.0], ub=[4.0, np.inf, 3.0])
    lp2 = lower_bounds_to_rows(lp)
    assert not lp2.has_finite_bounds
    # x1: GE 1 + LE 4; x2: GE -2 (negative → free mark); x3: FX row.
    assert lp2.n_cons == 1 + 2 + 1 + 1
    assert lp2.free.tolist() == [False, True, False]
    ref = _scipy_ref(lp)
    r = solve_lp(lp)                     # dense path lowers internally
    assert r.status == ref.status == 0
    assert r.z == pytest.approx(ref.fun, abs=1e-8)
    assert np.allclose(r.x, ref.x, atol=1e-7)


def test_bounds_dict_roundtrip():
    lp = _random_bounded_lp(7)
    lp2 = LinearProgram.from_problem_dict(lp.to_problem_dict())
    assert np.allclose(lp.lb, lp2.lb)
    assert np.allclose(lp.ub, lp2.ub)
    assert np.allclose(lp.A, lp2.A)


# --------------------------------------------------------------------------- #
# Bounded revised simplex (native path)                                       #
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("seed", range(8))
def test_revised_native_bounds_parity(seed):
    lp = _random_bounded_lp(seed)
    ref = _scipy_ref(lp)
    r = RevisedSimplexSolver().solve(lp)
    assert r.status == ref.status
    if ref.status == 0:
        zref = -ref.fun if lp.maximize else ref.fun
        assert r.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))
        # The reported point satisfies the ORIGINAL bounds.
        assert np.all(r.x >= lp.lb - 1e-6)
        assert np.all(r.x <= lp.ub + 1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_dense_lowered_bounds_parity(seed):
    lp = _random_bounded_lp(seed + 100)
    ref = _scipy_ref(lp)
    r = solve_lp(lp)
    assert r.status == ref.status
    if ref.status == 0:
        zref = -ref.fun if lp.maximize else ref.fun
        assert r.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))


def test_bound_flip_is_exercised():
    """max x1 + 0.1 x2 s.t. x1 + x2 <= 10, x1 <= 2, x2 <= 3: optimum sits
    at BOTH upper bounds with the row slack basic — reachable only through
    nonbasic-at-upper states (a row-form solve needs extra pivots)."""
    lp = LinearProgram(c=[1.0, 0.1], A=[[1.0, 1.0]], b=[10.0], ops=[-1],
                       maximize=True, ub=[2.0, 3.0])
    r = RevisedSimplexSolver().solve(lp)
    assert r.status == 0
    assert r.x == pytest.approx([2.0, 3.0])
    assert r.z == pytest.approx(2.3)


def test_fixed_variable_fx():
    lp = LinearProgram(c=[1.0, 1.0], A=[[1.0, 1.0]], b=[10.0], ops=[-1],
                       maximize=True, lb=[2.5, 0.0], ub=[2.5, np.inf])
    ref = _scipy_ref(lp)
    r = RevisedSimplexSolver().solve(lp)
    assert r.status == 0
    assert r.x[0] == pytest.approx(2.5)
    assert r.z == pytest.approx(-ref.fun)


def test_infeasible_bounds_detected():
    # x1 >= 5 (lb) but row forces x1 <= 1.
    lp = LinearProgram(c=[1.0], A=[[1.0]], b=[1.0], ops=[-1],
                       maximize=True, lb=[5.0])
    for r in (RevisedSimplexSolver().solve(lp), solve_lp(lp)):
        assert r.status == 2


def test_unbounded_above_ub_elsewhere():
    # x2 capped but x1 free to grow: unbounded max.
    lp = LinearProgram(c=[1.0, 1.0], A=[[0.0, 1.0]], b=[1.0], ops=[-1],
                       maximize=True, ub=[np.inf, 1.0])
    for r in (RevisedSimplexSolver().solve(lp), solve_lp(lp)):
        assert r.status == 3


def test_bounded_sensitivity_native():
    """Reduced costs follow the native convention: rc = c - y'A over
    structural rows, nonzero for variables pinned at their bounds."""
    lp = LinearProgram(c=[3.0, 1.0], A=[[1.0, 1.0]], b=[10.0], ops=[-1],
                       maximize=True, ub=[2.0, np.inf])
    r = RevisedSimplexSolver().solve(lp)
    assert r.status == 0
    assert r.x == pytest.approx([2.0, 8.0])
    # Row is binding with price 1 (from x2); x1 at ub has rc = 3 - 1 = 2.
    assert r.duals[0] == pytest.approx(1.0, abs=1e-7)
    assert r.reduced_costs[0] == pytest.approx(2.0, abs=1e-6)


# --------------------------------------------------------------------------- #
# MPS fixture with >= 30 bounds: m stays the STRUCTURAL row count            #
# (the VERDICT r2 item-1 'done' criterion)                                    #
# --------------------------------------------------------------------------- #
def _many_bounds_mps(n_vars: int = 40, m_rows: int = 8,
                     seed: int = 5) -> str:
    rng = np.random.default_rng(seed)
    lines = ["NAME          MANYBND", "ROWS", " N  COST"]
    for i in range(m_rows):
        lines.append(f" {'LGE'[i % 3]}  R{i}")
    lines.append("COLUMNS")
    x0 = rng.uniform(0.5, 2.0, size=n_vars)
    A = np.where(rng.random((m_rows, n_vars)) < 0.4,
                 rng.normal(size=(m_rows, n_vars)).round(3), 0.0)
    for i in range(m_rows):
        if not A[i].any():
            A[i, rng.integers(0, n_vars)] = 1.0
    c = rng.normal(size=n_vars).round(3)
    # Keep the min-form objective bounded by construction: unbounded-above
    # variables (the 8 without bounds, j >= 32) get nonnegative cost;
    # unbounded-below MI variables (kind 3) get nonpositive cost so the
    # optimum pushes them UP into their finite ub.
    c[32:] = np.abs(c[32:])
    for j in range(32):
        if j % 4 == 3:
            c[j] = -abs(c[j])
    for j in range(n_vars):
        lines.append(f"    X{j}  COST  {c[j]}")
        for i in range(m_rows):
            if A[i, j]:
                lines.append(f"    X{j}  R{i}  {A[i, j]}")
    act = A @ x0
    lines.append("RHS")
    for i in range(m_rows):
        rhs = act[i] + (0.5 if i % 3 == 0 else (-0.5 if i % 3 == 1 else 0.0))
        lines.append(f"    RHS  R{i}  {round(rhs, 4)}")
    lines.append("BOUNDS")
    # 32 bounded variables: UP / LO / boxed / FX / MI mix.
    for j in range(32):
        kind = j % 4
        if kind == 0:
            lines.append(f" UP BND  X{j}  {round(x0[j] + 1.0, 3)}")
        elif kind == 1:
            lines.append(f" LO BND  X{j}  {round(x0[j] - 1.0, 3)}")
            lines.append(f" UP BND  X{j}  {round(x0[j] + 2.0, 3)}")
        elif kind == 2:
            lines.append(f" FX BND  X{j}  {round(x0[j], 3)}")
        else:
            lines.append(" MI BND  X{}".format(j))
            lines.append(f" UP BND  X{j}  {round(x0[j] + 0.5, 3)}")
    lines.append("ENDATA")
    return "\n".join(lines)


def test_mps_many_bounds_native_through_revised():
    text = _many_bounds_mps()
    lp = parse_mps(text)
    # >= 30 bounds, yet m is the STRUCTURAL count — no bound rows.
    assert lp.n_cons == 8
    n_bounded = int(np.sum((lp.lb != 0) | np.isfinite(lp.ub)))
    assert n_bounded >= 30
    ref = _scipy_ref(lp)
    assert ref.status == 0
    r = RevisedSimplexSolver().solve(lp)
    assert r.status == 0
    zref = ref.fun
    assert r.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))
    assert np.all(r.x >= lp.lb - 1e-6)
    assert np.all(r.x <= lp.ub + 1e-6)


def test_bounded_warm_start_fewer_pivots():
    """VERDICT r3 item 8: SimplexResult carries at_upper, and the revised
    engine honors (basis, at_upper) warm starts on BOUNDED LPs — a
    re-solve after a small RHS perturbation must pivot strictly less than
    a cold solve (and still match scipy)."""
    rng = np.random.default_rng(19)
    wins, total = 0, 0
    for seed in range(6):
        rng = np.random.default_rng(300 + seed)
        m, n = 24, 16
        A = rng.uniform(0.1, 1.0, size=(m, n))
        x0 = rng.uniform(0.2, 1.5, size=n)
        b = A @ x0 + rng.uniform(0.05, 0.4, size=m)
        c = rng.uniform(0.1, 1.0, size=n)
        ub = np.where(rng.random(n) < 0.6, x0 * rng.uniform(0.7, 1.6, n),
                      np.inf)
        lp = LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1),
                           maximize=True, ub=ub)
        cold = RevisedSimplexSolver().solve(lp)
        assert cold.success and cold.at_upper is not None
        lp2 = LinearProgram(c=c, A=A, b=b * 1.001, ops=np.full(m, -1),
                            maximize=True, ub=ub)
        warm = RevisedSimplexSolver().solve(
            lp2, warm_basis=cold.basis, warm_at_upper=cold.at_upper)
        cold2 = RevisedSimplexSolver().solve(lp2)
        assert warm.success
        ref = _scipy_ref(lp2)
        zref = -ref.fun
        assert warm.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))
        assert warm.nit <= cold2.nit
        wins += int(warm.nit < cold2.nit)
        total += 1
    assert wins * 2 >= total, f"warm won {wins}/{total}"


def test_bounded_dual_reoptimize_beats_cold():
    """VERDICT r4 item 4: a BOUNDED LP reoptimizes natively after an RHS
    perturbation from (basis, at_upper) — the bounded dual kernel
    (ops/tableau.solve_tableau_dual_bounded) must beat the cold bounded
    solve in pivots while matching scipy, certified."""
    from simplex_tpu.models.dense import reoptimize

    wins, total = 0, 0
    for seed in range(6):
        rng = np.random.default_rng(400 + seed)
        m, n = 24, 16
        A = rng.uniform(0.1, 1.0, size=(m, n))
        x0 = rng.uniform(0.2, 1.5, size=n)
        b = A @ x0 + rng.uniform(0.05, 0.4, size=m)
        c = rng.uniform(0.1, 1.0, size=n)
        ub = np.where(rng.random(n) < 0.6, x0 * rng.uniform(0.7, 1.6, n),
                      np.inf)
        lp = LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1),
                           maximize=True, ub=ub)
        cold = RevisedSimplexSolver().solve(lp)
        assert cold.success and cold.at_upper is not None
        # RHS shrink: old basis goes primal-infeasible (possibly past a
        # bound on either side), stays dual-feasible.
        b2 = b * (1.0 - rng.uniform(0.01, 0.05, size=m))
        lp2 = LinearProgram(c=c, A=A, b=b2, ops=np.full(m, -1),
                            maximize=True, ub=ub)
        warm = reoptimize(lp2, cold.basis, at_upper=cold.at_upper)
        cold2 = RevisedSimplexSolver().solve(lp2)
        assert warm.success and cold2.success
        ref = _scipy_ref(lp2)
        assert ref.status == 0
        zref = -ref.fun
        assert warm.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))
        assert warm.at_upper is not None
        wins += int(warm.nit < cold2.nit)
        total += 1
    assert wins * 2 >= total, f"dual warm won {wins}/{total}"


def test_bounded_dual_reoptimize_rhs_increase_above_upper():
    """RHS INCREASES push basic variables ABOVE their upper bounds — the
    delta = -1 leave-at-upper regime of the bounded dual ratio test.  The
    round-5 review found the leaving column re-entering as a ratio-0
    self-pivot here (certification caught it, silently cold-starting);
    the warm path must now genuinely survive: at_upper is only non-None
    when the dual kernel's verdict certified."""
    from simplex_tpu.models.dense import reoptimize

    warm_survived = 0
    for seed in range(8):
        rng = np.random.default_rng(500 + seed)
        m, n = 20, 14
        A = rng.uniform(0.1, 1.0, size=(m, n))
        x0 = rng.uniform(0.2, 1.5, size=n)
        b = A @ x0 + rng.uniform(0.05, 0.4, size=m)
        c = rng.uniform(0.1, 1.0, size=n)
        ub = np.where(rng.random(n) < 0.6, x0 * rng.uniform(0.7, 1.6, n),
                      np.inf)
        lp = LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1),
                           maximize=True, ub=ub)
        cold = RevisedSimplexSolver().solve(lp)
        assert cold.success and cold.at_upper is not None
        b2 = b * (1.0 + rng.uniform(0.05, 0.25, size=m))   # INCREASE
        lp2 = LinearProgram(c=c, A=A, b=b2, ops=np.full(m, -1),
                            maximize=True, ub=ub)
        warm = reoptimize(lp2, cold.basis, at_upper=cold.at_upper)
        assert warm.success
        ref = _scipy_ref(lp2)
        assert ref.status == 0
        zref = -ref.fun
        assert warm.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))
        # The cold fallback (row-lowered dense solve) returns
        # at_upper=None — non-None proves the warm dual kernel's verdict
        # itself passed certification.
        warm_survived += int(warm.at_upper is not None)
    assert warm_survived >= 6, f"warm path survived only {warm_survived}/8"


def test_bounded_dual_reoptimize_infeasible_rhs():
    """An RHS change that empties the bounded feasible region must come
    back infeasible (kernel detects no eligible entering column, the
    certified fallback confirms)."""
    from simplex_tpu.models.dense import reoptimize

    rng = np.random.default_rng(55)
    m, n = 8, 5
    A = rng.uniform(0.2, 1.0, size=(m, n))
    b = rng.uniform(2.0, 5.0, size=m)
    ub = rng.uniform(0.5, 2.0, size=n)
    lp = LinearProgram(c=np.ones(n), A=A, b=b, ops=np.full(m, -1),
                       maximize=True, ub=ub)
    cold = RevisedSimplexSolver().solve(lp)
    assert cold.success
    b2 = b.copy()
    b2[0] = -1.0          # 0 <= A[0] x <= b2[0] < 0: empty
    lp2 = LinearProgram(c=np.ones(n), A=A, b=b2, ops=np.full(m, -1),
                        maximize=True, ub=ub)
    warm = reoptimize(lp2, cold.basis, at_upper=cold.at_upper)
    assert not warm.success and warm.status == 2


def test_bounded_dual_reoptimize_chains():
    """(basis, at_upper) from a bounded reoptimize feeds the NEXT
    reoptimize (warm chains, the sensitivity-analysis loop pattern)."""
    from simplex_tpu.models.dense import reoptimize

    rng = np.random.default_rng(77)
    m, n = 16, 10
    A = rng.uniform(0.1, 1.0, size=(m, n))
    x0 = rng.uniform(0.3, 1.2, size=n)
    b = A @ x0 + rng.uniform(0.1, 0.3, size=m)
    c = rng.uniform(0.1, 1.0, size=n)
    ub = np.where(rng.random(n) < 0.7, x0 * rng.uniform(0.8, 1.5, n),
                  np.inf)
    lp = LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1), maximize=True,
                       ub=ub)
    res = RevisedSimplexSolver().solve(lp)
    assert res.success
    for step in range(3):
        b = b * 0.99
        lp = LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1),
                           maximize=True, ub=ub)
        res = reoptimize(lp, res.basis, at_upper=res.at_upper)
        assert res.success, step
        ref = _scipy_ref(lp)
        zref = -ref.fun
        assert res.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))


def test_bounded_crossover_warm_starts_revised():
    """crossover_lp on a bounded LP routes through the revised engine's
    bounded warm start (not a cold solve): with a near-optimal point it
    must use fewer pivots than cold and return the certified optimum."""
    from simplex_tpu.models.crossover import crossover_lp

    rng = np.random.default_rng(23)
    m, n = 20, 12
    A = rng.uniform(0.1, 1.0, size=(m, n))
    x0 = rng.uniform(0.2, 1.5, size=n)
    b = A @ x0 + rng.uniform(0.05, 0.4, size=m)
    c = rng.uniform(0.1, 1.0, size=n)
    ub = np.where(rng.random(n) < 0.5, x0 * rng.uniform(0.8, 1.8, n),
                  np.inf)
    lp = LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1), maximize=True,
                       ub=ub)
    ref = _scipy_ref(lp)
    assert ref.status == 0
    # Near-optimal approximate point: the true optimum plus noise.
    x_approx = np.clip(ref.x + rng.normal(scale=1e-4, size=n), 0.0,
                       np.where(np.isfinite(ub), ub, np.inf))
    res = crossover_lp(lp, x_approx)
    cold = RevisedSimplexSolver().solve(lp)
    assert res.success
    zref = -ref.fun
    assert res.z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))
    assert res.nit <= cold.nit, (res.nit, cold.nit)


def test_batched_native_bounds_vs_scipy():
    """VERDICT r3 item 4: the batched tableau kernel handles 0 <= x <= ub
    NATIVELY (bounded ratio test + bound flips + at-upper extraction),
    certified, with statuses and objectives matching scipy HiGHS."""
    from simplex_tpu.models.batched import BatchedSimplexSolver

    rng = np.random.default_rng(77)
    B, m, n = 48, 8, 6
    A = rng.normal(size=(B, m, n)).round(2)
    x0 = rng.uniform(0.2, 2.0, size=(B, n))
    ops = rng.choice([-1, 0, 1], size=m, p=[0.6, 0.1, 0.3])
    slack = rng.uniform(0.1, 1.0, size=(B, m))
    b = np.einsum("bmn,bn->bm", A, x0) + np.where(
        ops == -1, slack, np.where(ops == 1, -slack, 0.0))
    c = rng.normal(size=(B, n)).round(2)
    # ~60% of variables finitely bounded, half of those binding-tight.
    has_ub = rng.random((B, n)) < 0.6
    ub = np.where(has_ub,
                  x0 + rng.uniform(-0.3, 1.5, size=(B, n)).clip(0.01),
                  np.inf)
    res = BatchedSimplexSolver().solve_arrays(c, A, b, ops,
                                              maximize=False, ub=ub)
    assert res.certified is not None and np.all(res.certified)
    assert res.at_upper is not None
    n_opt = 0
    for i in range(B):
        bounds = [(0.0, None if np.isinf(ub[i, j]) else ub[i, j])
                  for j in range(n)]
        A_ub = [A[i, j] for j in range(m) if ops[j] == -1] + \
               [-A[i, j] for j in range(m) if ops[j] == 1]
        b_ub = [b[i, j] for j in range(m) if ops[j] == -1] + \
               [-b[i, j] for j in range(m) if ops[j] == 1]
        A_eq = [A[i, j] for j in range(m) if ops[j] == 0]
        b_eq = [b[i, j] for j in range(m) if ops[j] == 0]
        ref = linprog(c[i], A_ub=A_ub or None, b_ub=b_ub or None,
                      A_eq=A_eq or None, b_eq=b_eq or None, bounds=bounds,
                      method="highs", options={"presolve": False})
        assert ref.status == res.status[i], i
        if ref.status == 0:
            n_opt += 1
            assert res.z[i] == pytest.approx(
                ref.fun, abs=1e-6 * (1 + abs(ref.fun))), i
            xi = res.x[i]
            assert np.all(xi >= -1e-6) and np.all(xi <= ub[i] + 1e-6)
    assert n_opt >= 10          # the construction keeps many feasible


def test_batched_bound_flip_optimum_at_upper():
    """Optimum with BOTH variables nonbasic at their upper bounds — only
    reachable through bound flips / at-upper states in the batched kernel
    (mirror of the revised engine's test above)."""
    from simplex_tpu.models.batched import BatchedSimplexSolver

    c = np.array([[1.0, 0.1]])
    A = np.array([[[1.0, 1.0]]])
    b = np.array([[10.0]])
    res = BatchedSimplexSolver().solve_arrays(
        c, A, b, np.array([-1]), maximize=True,
        ub=np.array([[2.0, 3.0]]))
    assert res.status[0] == 0 and res.certified[0]
    assert res.x[0] == pytest.approx([2.0, 3.0])
    assert res.z[0] == pytest.approx(2.3)
    assert res.at_upper[0, :2].sum() == 2


def test_sweep_native_bounds_general():
    """solve_lp_sweep with GENERAL bounds (finite lb, flips, boxes, free)
    rides normalize_bounds + the native-ub kernel — no dense bound rows —
    and must match scipy on every instance."""
    from simplex_tpu.models.batched import solve_lp_sweep

    lps = [_random_bounded_lp(s) for s in range(200, 216)]
    out = solve_lp_sweep(lps)
    for lp, (x, z, status, ok) in zip(lps, out):
        ref = _scipy_ref(lp)
        assert status == ref.status
        if ref.status == 0:
            zref = -ref.fun if lp.maximize else ref.fun
            assert z == pytest.approx(zref, abs=1e-6 * (1 + abs(zref)))
            assert np.all(x >= lp.lb - 1e-6)
            assert np.all(x <= lp.ub + 1e-6)


def test_bounded_compile_keeps_structural_m():
    """Native bounds must NOT inflate the row count: the compiled tableau
    for a bound-heavy batch has m_pad derived from the structural m only
    (the row-lowering fallback would have added one row per bound)."""
    from simplex_tpu.models.batched import compile_batch_on_device

    B, m, n = 4, 10, 16
    rng = np.random.default_rng(3)
    A = rng.uniform(0.1, 1.0, (B, m, n))
    b = rng.uniform(5.0, 9.0, (B, m))
    c = rng.uniform(0.1, 1.0, (B, n))
    ub = np.full((B, n), 0.7)           # every variable bounded
    cb = compile_batch_on_device(c, A, b, np.full(m, -1), True, ub=ub)
    assert cb.basis.shape[1] <= ((m + 1 + 7) // 8) * 8   # no bound rows
    assert cb.ub_ext is not None


def test_bound_heavy_sweep_10k_certified():
    """VERDICT r3 item 4 acceptance: a 10k-instance bound-heavy sweep
    solves with m equal to the structural row count, fully certified,
    with scipy parity spot-checked on a random subset."""
    from simplex_tpu.models.batched import BatchedSimplexSolver

    rng = np.random.default_rng(5)
    B, m, n = 10_000, 12, 8
    A = rng.uniform(0.05, 1.0, size=(B, m, n))
    x0 = rng.uniform(0.2, 1.5, size=(B, n))
    b = np.einsum("bmn,bn->bm", A, x0) + rng.uniform(0.05, 0.5, (B, m))
    c = rng.uniform(0.1, 1.0, size=(B, n))
    ub = np.where(rng.random((B, n)) < 0.7,
                  x0 * rng.uniform(0.8, 2.0, (B, n)), np.inf)
    res = BatchedSimplexSolver().solve_arrays(c, A, b, np.full(m, -1),
                                              maximize=True, ub=ub)
    assert np.all(res.status == 0)
    assert np.all(res.certified)
    frac_esc = res.n_escalated / B
    assert frac_esc < 0.02, f"escalation rate {frac_esc:.3%}"
    for i in rng.integers(0, B, size=24):
        bounds = [(0.0, None if np.isinf(ub[i, j]) else float(ub[i, j]))
                  for j in range(n)]
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], bounds=bounds,
                      method="highs")
        assert res.z[i] == pytest.approx(
            -ref.fun, abs=1e-6 * (1 + abs(ref.fun))), i


def test_batched_lowers_bounds():
    lps = [_random_bounded_lp(s) for s in (11, 12)]
    # solve_many needs uniform n_vars: regenerate until they match.
    n = lps[0].n_vars
    lps = [lp for lp in (_random_bounded_lp(s) for s in range(11, 40))
           if lp.n_vars == n][:3]
    res = solve_lp_batch(lps)
    for i, lp in enumerate(lps):
        ref = _scipy_ref(lp)
        assert res.status[i] == ref.status
        if ref.status == 0:
            zref = -ref.fun if lp.maximize else ref.fun
            assert res.z[i] == pytest.approx(zref, abs=1e-3 * (1 + abs(zref)))


# --------------------------------------------------------------------------- #
# Fixed-format MPS with embedded spaces: loud rejection                       #
# --------------------------------------------------------------------------- #
def test_mps_space_in_name_rejected():
    bad = """NAME T
ROWS
 N  COST
 L  ROW ONE
COLUMNS
    X1  COST  1.0  ROW ONE  1.0
RHS
    RHS  ROW ONE  4.0
ENDATA
"""
    with pytest.raises(ValueError, match="espacios"):
        parse_mps(bad)


def test_mps_even_field_count_rejected():
    bad = """NAME T
ROWS
 N  COST
 L  R1
COLUMNS
    MY COL  COST  1.0
RHS
    RHS  R1  4.0
ENDATA
"""
    with pytest.raises(ValueError, match="espacios|inválido"):
        parse_mps(bad)

"""PDHG streaming driver + PDHG→simplex crossover (VERDICT r2 item 6).

The 1M-instance production shape: chunked generator → pipelined device
solves (staging k+1 overlaps solve k) → optional exact-vertex recovery via
the crossover (models/crossover.py).  Real engines vs scipy, no mocks.
"""
import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu.core.problem import LinearProgram
from simplex_tpu.models.crossover import basis_guess, crossover_lp
from simplex_tpu.models.pdhg import PdhgSolver, solve_arrays_stream


def _mk_batch(rng, B, m, n):
    A = rng.uniform(0.1, 1.0, size=(B, m, n))
    b = rng.uniform(1.0, 5.0, size=(B, m))
    c = rng.uniform(0.1, 1.0, size=(B, n))
    return c, A, b, np.full((m,), -1)


def test_stream_matches_single_batches():
    rng = np.random.default_rng(3)
    B, m, n = 16, 10, 6
    batches = [_mk_batch(rng, B, m, n) for _ in range(3)]

    streamed = list(solve_arrays_stream(
        iter(batches), tol=1e-5, max_iters=60000, maximize=True))
    assert len(streamed) == 3
    solver = PdhgSolver(tol=1e-5, max_iters=60000)
    for res, (c, A, b, ops) in zip(streamed, batches):
        ref = solver.solve_arrays(c, A, b, ops, maximize=True)
        assert res.converged.sum() == ref.converged.sum()
        ok = res.converged & ref.converged
        np.testing.assert_allclose(res.objective[ok], ref.objective[ok],
                                   rtol=1e-3, atol=1e-3)


def test_stream_crossover_recovers_exact_vertices():
    rng = np.random.default_rng(9)
    B, m, n = 8, 10, 6
    batches = [_mk_batch(rng, B, m, n) for _ in range(2)]
    out = list(solve_arrays_stream(
        iter(batches), tol=1e-5, max_iters=60000, maximize=True,
        crossover="all"))
    for res, (c, A, b, ops) in zip(out, batches):
        assert res.exact is not None and len(res.exact) == B
        for i in range(B):
            ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
            r = res.exact[i]
            assert r.success
            # Exact to 1e-9-ish (f64-certified vertex), not PDHG's 1e-4.
            assert r.z == pytest.approx(-ref.fun, rel=1e-8, abs=1e-8), i
            assert res.objective[i] == pytest.approx(-ref.fun, rel=1e-8,
                                                     abs=1e-8)


def test_crossover_warm_start_uses_fewer_pivots():
    """The point of the crossover: starting from the PDHG basis guess must
    beat a cold solve on pivot count for a converged instance (when the
    guessed basis is accepted; a rejected guess falls back to cold and
    ties, so assert <=, and require a strict win on at least half)."""
    from simplex_tpu.models.dense import solve_lp

    rng = np.random.default_rng(17)
    wins, total = 0, 0
    for _ in range(6):
        m, n = 12, 8
        A = rng.uniform(0.1, 1.0, size=(m, n))
        b = rng.uniform(1.0, 5.0, size=m)
        c = rng.uniform(0.1, 1.0, size=n)
        lp = LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1), maximize=True)
        pd = PdhgSolver(tol=1e-6, max_iters=120000).solve_arrays(
            c[None], A[None], b[None], np.full((m,), -1), maximize=True)
        if not pd.converged[0]:
            continue
        warm = crossover_lp(lp, pd.x[0])
        cold = solve_lp(lp)
        assert warm.success and cold.success
        assert warm.z == pytest.approx(cold.z, rel=1e-8, abs=1e-8)
        assert warm.nit <= cold.nit
        wins += int(warm.nit < cold.nit)
        total += 1
    assert total >= 3
    assert wins * 2 >= total, f"crossover won {wins}/{total}"


def test_pdhg_box_bounds_stream_with_recovery():
    """Round 4: PDHG projects onto the native box 0 <= x <= ub and the
    streaming driver's exact recovery runs through the BOUNDED batched
    engine — end-to-end parity vs scipy with bounds."""
    rng = np.random.default_rng(8)
    B, m, n = 48, 10, 8
    A = rng.uniform(0.1, 1.0, (B, m, n))
    x0 = rng.uniform(0.2, 1.5, (B, n))
    b = np.einsum("bmn,bn->bm", A, x0) + rng.uniform(0.1, 0.5, (B, m))
    c = rng.uniform(0.1, 1.0, (B, n))
    ub = np.where(rng.random(n) < 0.7,
                  rng.uniform(0.5, 1.8, size=n), np.inf)
    out = list(solve_arrays_stream(
        iter([(c, A, b, np.full(m, -1))]), tol=1e-5, max_iters=40000,
        maximize=True, crossover="unconverged", ub=ub))
    res = out[0]
    assert np.all(res.converged)
    bounds = [(0.0, None if np.isinf(u) else u) for u in ub]
    for i in range(0, B, 5):
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], bounds=bounds,
                      method="highs")
        assert res.objective[i] == pytest.approx(
            -ref.fun, rel=2e-4, abs=2e-4), i
        assert np.all(res.x[i] <= ub + 1e-4)


def test_pdhg_well_scaled_convergence_fraction():
    """Round-4 regression pin: the r3 ω-rebalancing silently HALVED
    convergence on the well-scaled sweep family (1022/2048 at 1e-4/10k
    iters vs r2's 2035/2048) because nothing asserted it.  The shipped
    hybrid ω⁰ (1 for mild imbalance, sqrt(‖c‖/‖b‖) for skewed), no
    rebalancing, measures 2035/2048 (99.4%); this pin fails if a future
    change costs more than ~2% of the family."""
    from simplex_tpu.models.pdhg import PdhgSolver

    rng = np.random.default_rng(0)
    B, m, n = 512, 20, 30
    A = rng.uniform(0.05, 1.0, size=(B, m, n)).astype(np.float32)
    b = rng.uniform(1.0, 5.0, size=(B, m)).astype(np.float32)
    c = rng.uniform(0.1, 1.0, size=(B, n)).astype(np.float32)
    res = PdhgSolver(tol=1e-4, max_iters=10000).solve_arrays(
        c, A, b, np.full(m, -1), maximize=True)
    frac = res.converged.mean()
    assert frac >= 0.97, f"well-scaled convergence degraded: {frac:.3f}"


def test_pdhg_omega_handles_skewed_scales():
    """PDLP ω-rebalancing regression: rhs 300x the cost scale.  With fixed
    tau=sigma these instances needed >64k iterations (0/32 converged at a
    4k cap); the primal-weight scheme converges most of them well inside
    it."""
    rng = np.random.default_rng(1)
    B, m, n = 32, 12, 8
    A = rng.uniform(0.1, 1.0, (B, m, n))
    b = rng.uniform(1.0, 5.0, (B, m)) * 300.0
    c = rng.uniform(0.1, 1.0, (B, n))
    res = PdhgSolver(tol=1e-5, max_iters=4000).solve_arrays(
        c, A, b, np.full(m, -1), maximize=True)
    assert int(res.converged.sum()) >= 22, int(res.converged.sum())
    ok = res.converged
    for i in np.nonzero(ok)[0][:8]:
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
        assert res.objective[i] == pytest.approx(-ref.fun, rel=2e-3), i


def test_basis_guess_layout():
    lp = LinearProgram(c=[1.0, 1.0], A=[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                       b=[2.0, 3.0, 10.0], ops=[-1, -1, -1], maximize=True)
    # Optimal x=(2,3): third row slack (=5) basic, x1, x2 basic.
    g = basis_guess(lp, np.array([2.0, 3.0]))
    assert g is not None
    assert set(g[:3].tolist()) == {0, 1, 4}  # x1, x2, slack of row 3 (n+2)


def test_stream_crossover_many_instances_batched_path():
    """>= 64 recovery candidates route through ONE certified batched
    device solve instead of a per-instance host loop (VERDICT r3 weak #5);
    every recovered optimum must still match scipy exactly."""
    rng = np.random.default_rng(31)
    B, m, n = 96, 8, 5
    batches = [_mk_batch(rng, B, m, n)]
    out = list(solve_arrays_stream(
        iter(batches), tol=1e-9, max_iters=10, maximize=True,
        crossover="unconverged"))
    res = out[0]
    assert res.exact is not None and len(res.exact) >= 64
    c, A, b, ops = batches[0]
    for i in list(res.exact)[:16]:
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
        r = res.exact[i]
        assert r.success
        assert r.z == pytest.approx(-ref.fun, rel=1e-7, abs=1e-7), i
    assert np.all(res.converged)


def test_basis_guess_eq_heavy_no_crash():
    """ADVICE r3 (medium): m > n + n_inequality (EQ-heavy) used to raise a
    broadcast ValueError in basis_guess — the candidate pool has only
    n + n_ineq columns.  The intended behavior is a valid (possibly
    fallback-triggering) guess and an exact crossover result."""
    lp = LinearProgram(c=[1.0, 2.0],
                       A=[[1.0, 1.0], [1.0, -1.0], [2.0, 2.0]],
                       b=[3.0, 1.0, 6.0], ops=[0, 0, 0], maximize=False)
    g = basis_guess(lp, np.array([2.0, 1.0]))   # must not raise
    assert g is not None and g.shape[0] >= 3
    res = crossover_lp(lp, np.array([2.0, 1.0]))
    assert res.success
    assert res.z == pytest.approx(4.0, abs=1e-8)  # x=(2,1), z=1*2+2*1


def test_stream_crossover_unconverged_mode():
    """'unconverged' recovers only the failures: cap PDHG iterations so
    nothing converges, then every instance must get an exact result."""
    rng = np.random.default_rng(23)
    B, m, n = 4, 8, 5
    batches = [_mk_batch(rng, B, m, n)]
    out = list(solve_arrays_stream(
        iter(batches), tol=1e-9, max_iters=50, maximize=True,
        crossover="unconverged"))
    res = out[0]
    assert res.exact is not None and len(res.exact) >= 1
    c, A, b, ops = batches[0]
    for i, r in res.exact.items():
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
        assert r.success
        assert r.z == pytest.approx(-ref.fun, rel=1e-8, abs=1e-8)

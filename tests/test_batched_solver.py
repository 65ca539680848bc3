"""Batched-solver tests: uniform array path and heterogeneous list path.

Strategy mirrors SURVEY.md §4's "equivalent-strategy mapping": the batched
engine is validated against scipy HiGHS per instance (no mocks), matching the
reference's solver-contract tests (``tests/test_solver_controller.py``) but
run against the real engine.
"""
import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu import LinearProgram
from simplex_tpu.models.batched import BatchedSimplexSolver, solve_lp_batch


def _scipy_solve(c, A, b, ops, maximize):
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(len(b)):
        if ops[i] == -1:
            A_ub.append(A[i]); b_ub.append(b[i])
        elif ops[i] == 1:
            A_ub.append(-A[i]); b_ub.append(-b[i])
        else:
            A_eq.append(A[i]); b_eq.append(b[i])
    cs = np.asarray(c) * (-1 if maximize else 1)
    return linprog(cs, A_ub=A_ub or None, b_ub=b_ub or None,
                   A_eq=A_eq or None, b_eq=b_eq or None,
                   method="highs", options={"presolve": False})


def test_batch_all_le_matches_scipy():
    rng = np.random.default_rng(1)
    B, m, n = 32, 6, 4
    A = rng.uniform(0.1, 2.0, size=(B, m, n))
    b = rng.uniform(1.0, 10.0, size=(B, m))
    c = rng.uniform(0.1, 3.0, size=(B, n))
    ops = np.full((m,), -1)
    res = BatchedSimplexSolver().solve_arrays(c, A, b, ops, maximize=True)
    assert res.n_optimal == B
    for i in range(B):
        ref = _scipy_solve(c[i], A[i], b[i], ops, True)
        assert res.z[i] == pytest.approx(-ref.fun, rel=1e-4, abs=1e-4)


def test_batch_mixed_ops_statuses_match_scipy():
    rng = np.random.default_rng(2)
    B = 64
    A = rng.normal(size=(B, 5, 4)).round(2)
    b = rng.uniform(-3, 8, size=(B, 5)).round(2)
    c = rng.normal(size=(B, 4)).round(2)
    ops = np.array([-1, 1, 0, -1, 1])
    res = BatchedSimplexSolver().solve_arrays(c, A, b, ops, maximize=False)
    for i in range(B):
        ref = _scipy_solve(c[i], A[i], b[i], ops, False)
        if ref.status == 0 and res.status[i] == 0:
            assert res.z[i] == pytest.approx(ref.fun, rel=1e-4, abs=1e-4), i
        else:
            assert ref.status == res.status[i], (
                f"instance {i}: scipy {ref.status} vs ours {res.status[i]}"
            )


def test_batch_per_instance_maximize_flags():
    c = np.array([[1.0, 2.0], [1.0, 2.0]])
    A = np.tile(np.array([[1.0, 1.0]]), (2, 1, 1))
    b = np.full((2, 1), 4.0)
    ops = np.array([-1])
    res = BatchedSimplexSolver().solve_arrays(
        c, A, b, ops, maximize=np.array([True, False])
    )
    assert res.z[0] == pytest.approx(8.0)   # max 2*x2 at x2=4
    assert res.z[1] == pytest.approx(0.0)   # min at origin


def test_solve_many_heterogeneous_constraint_counts():
    lps = [
        LinearProgram(c=[3, 5], A=[[1, 0], [0, 2], [3, 2]], b=[4, 12, 18],
                      ops=[-1, -1, -1], maximize=True),
        LinearProgram(c=[50, 80], A=[[4, 1], [1, 6], [4, 6]], b=[4, 6, 12],
                      ops=[1, 1, 1], maximize=False),
        LinearProgram(c=[1, 1], A=[[1, -1]], b=[1], ops=[-1], maximize=True),
    ]
    res = solve_lp_batch(lps)
    assert res.status.tolist() == [0, 0, 3]
    assert res.z[0] == pytest.approx(36.0, rel=1e-5)
    # True optimum of the reference's MIN mock data (its canned 108.6957 is
    # not achievable — that point is infeasible for its own constraints).
    assert res.z[1] == pytest.approx(153.3333333, rel=1e-4)
    assert np.isnan(res.z[2])


def test_solve_many_rejects_mixed_variable_counts():
    lps = [
        LinearProgram(c=[1, 1], A=[[1, 1]], b=[1], ops=[-1], maximize=True),
        LinearProgram(c=[1, 1, 1], A=[[1, 1, 1]], b=[1], ops=[-1],
                      maximize=True),
    ]
    with pytest.raises(AssertionError):
        solve_lp_batch(lps)


def test_batch_infeasible_and_unbounded_detection():
    # instance 0: infeasible (x <= 1 and x >= 3); instance 1: feasible.
    c = np.array([[1.0], [1.0]])
    A = np.tile(np.array([[1.0], [1.0]])[None], (2, 1, 1))
    b = np.array([[1.0, 3.0], [5.0, 2.0]])
    ops = np.array([-1, 1])
    res = BatchedSimplexSolver().solve_arrays(c, A, b, ops, maximize=True)
    assert res.status[0] == 2
    assert res.status[1] == 0
    assert res.z[1] == pytest.approx(5.0)


def test_batched_deterministic_replay():
    """Determinism guard (SURVEY.md §5.2): the batched solve is a pure
    function — two runs on identical inputs must agree bitwise."""
    rng = np.random.default_rng(42)
    B, m, n = 16, 5, 4
    A = rng.normal(size=(B, m, n)).round(2)
    b = rng.uniform(0.5, 6.0, size=(B, m)).round(2)
    c = rng.normal(size=(B, n)).round(2)
    ops = np.array([-1, 1, 0, -1, -1])
    solver = BatchedSimplexSolver()
    r1 = solver.solve_arrays(c, A, b, ops, maximize=True)
    r2 = solver.solve_arrays(c, A, b, ops, maximize=True)
    np.testing.assert_array_equal(r1.status, r2.status)
    np.testing.assert_array_equal(
        np.nan_to_num(r1.x), np.nan_to_num(r2.x))
    np.testing.assert_array_equal(
        np.nan_to_num(r1.z), np.nan_to_num(r2.z))


def test_batched_rejects_nonfinite_inputs():
    """NaN/Inf guard (SURVEY.md §5.2): non-finite problem data must fail
    loudly, not propagate silently through the kernels."""
    c = np.array([[1.0, np.nan]])
    A = np.ones((1, 1, 2))
    b = np.ones((1, 1))
    with pytest.raises(ValueError, match="finit"):
        BatchedSimplexSolver().solve_arrays(c, A, b, np.array([-1]))


def test_stream_pipeline_matches_single_batches():
    """solve_arrays_stream: pipelined sweep yields the same per-batch
    results as independent solve_arrays calls, in order."""
    from simplex_tpu.models.batched import (
        BatchedSimplexSolver, solve_arrays_stream,
    )

    rng = np.random.default_rng(8)
    m, n, B = 10, 14, 32
    ops = np.full((m,), -1)

    def make(seed):
        r = np.random.default_rng(seed)
        A = r.uniform(0.05, 1.0, size=(B, m, n)).astype(np.float32)
        b = r.uniform(1.0, 5.0, size=(B, m)).astype(np.float32)
        c = r.uniform(0.1, 1.0, size=(B, n)).astype(np.float32)
        return c, A, b, ops

    batches = [make(s) for s in range(3)]
    solver = BatchedSimplexSolver()
    singles = [solver.solve_arrays(*bt, maximize=True) for bt in batches]
    streamed = list(solve_arrays_stream(batches, maximize=True))
    assert len(streamed) == 3
    for s1, s2 in zip(singles, streamed):
        np.testing.assert_array_equal(s1.status, s2.status)
        np.testing.assert_allclose(s1.z, s2.z, rtol=1e-6)


def test_stream_pipeline_bounded_batches():
    """Bounded batches (5-tuple with ub) ride the streaming pipeline
    (VERDICT r4 missing #5): certified results match independent bounded
    solve_arrays calls, and mixing bounded/unbounded batches works."""
    from simplex_tpu.models.batched import (
        BatchedSimplexSolver, solve_arrays_stream,
    )

    m, n, B = 10, 14, 24
    ops = np.full((m,), -1)

    def make(seed, with_ub):
        r = np.random.default_rng(seed)
        A = r.uniform(0.05, 1.0, size=(B, m, n)).astype(np.float32)
        b = r.uniform(1.0, 5.0, size=(B, m)).astype(np.float32)
        c = r.uniform(0.1, 1.0, size=(B, n)).astype(np.float32)
        if with_ub:
            ub = r.uniform(0.3, 4.0, size=(B, n))
            return (c, A, b, ops, ub)
        return (c, A, b, ops)

    batches = [make(0, True), make(1, False), make(2, True)]
    solver = BatchedSimplexSolver()
    singles = [
        solver.solve_arrays(*bt[:4], maximize=True,
                            ub=bt[4] if len(bt) > 4 else None)
        for bt in batches
    ]
    streamed = list(solve_arrays_stream(batches, maximize=True))
    assert len(streamed) == 3
    for k, (s1, s2) in enumerate(zip(singles, streamed)):
        np.testing.assert_array_equal(s1.status, s2.status, err_msg=str(k))
        np.testing.assert_allclose(s1.z, s2.z, rtol=1e-6, err_msg=str(k))
        assert s2.certified is not None and s2.certified.all()
        if len(batches[k]) > 4:
            assert s2.at_upper is not None
    # The bounded batches must actually exercise at-upper optima.
    assert streamed[0].at_upper.any() or streamed[2].at_upper.any()


def test_heterogeneous_sweep_buckets_and_matches():
    """solve_lp_sweep: mixed-shape LPs bucketed by compiled shape, results
    in original order matching single solves."""
    from simplex_tpu import LinearProgram, solve_lp
    from simplex_tpu.models.batched import solve_lp_sweep

    rng = np.random.default_rng(77)
    lps = []
    for _ in range(12):
        m = int(rng.integers(1, 6))
        n = int(rng.integers(1, 6))
        lps.append(LinearProgram(
            c=rng.uniform(0.1, 2.0, size=n).round(2),
            A=rng.uniform(0.05, 1.0, size=(m, n)).round(2),
            b=rng.uniform(1.0, 5.0, size=m).round(2),
            ops=np.full(m, -1), maximize=True))
    out = solve_lp_sweep(lps)
    assert len(out) == 12
    for lp, (x, z, status, ok) in zip(lps, out):
        single = solve_lp(lp)
        assert status == single.status
        if ok:
            assert abs(z - single.z) <= 1e-5 * (1 + abs(single.z))


def test_sweep_edge_cases_no_constraints_and_unbounded():
    """Vacuous padding rows (0'x <= 1) must preserve the no-constraint and
    unbounded semantics of the single-LP path."""
    from simplex_tpu import LinearProgram, solve_lp
    from simplex_tpu.models.batched import solve_lp_sweep

    lps = [
        # No constraints, max with positive cost: unbounded (status 3).
        LinearProgram(c=[1.0], A=np.zeros((0, 1)), b=[], ops=[],
                      maximize=True),
        # No constraints, min with positive cost: x = 0 optimal.
        LinearProgram(c=[1.0, 2.0], A=np.zeros((0, 2)), b=[], ops=[],
                      maximize=False),
        # Unbounded direction with a real constraint present.
        LinearProgram(c=[1.0, 0.0], A=[[0.0, 1.0]], b=[5.0], ops=[-1],
                      maximize=True),
    ]
    out = solve_lp_sweep(lps)
    for lp, (x, z, status, ok) in zip(lps, out):
        single = solve_lp(lp)
        assert status == single.status, (status, single.status)
        if ok:
            assert abs(z - single.z) <= 1e-6


def test_device_assembly_matches_host_compile():
    """compile_batch_on_device must produce exactly what the numpy
    compile_batch_uniform produces (tableau, basis, masks, objective rows,
    phase flags) across mixed operators and negative RHS flips."""
    import numpy as np
    from simplex_tpu.models.batched import (
        compile_batch_on_device,
        compile_batch_uniform,
    )

    rng = np.random.default_rng(5)
    B, m, n = 6, 7, 5
    A = rng.normal(size=(B, m, n)).round(2)
    b = rng.uniform(-4, 8, size=(B, m)).round(2)   # negatives force flips
    c = rng.normal(size=(B, n)).round(2)
    ops = np.array([-1, 1, 0, -1, 1, 0, -1])
    maximize = rng.integers(0, 2, size=B).astype(bool)

    host = compile_batch_uniform(c, A, b, ops, maximize)
    dev = compile_batch_on_device(c, A, b, ops, maximize)
    np.testing.assert_allclose(np.asarray(dev.T0), host.T0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev.basis), host.basis)
    np.testing.assert_array_equal(np.asarray(dev.col_mask_p1),
                                  host.col_mask_p1)
    np.testing.assert_array_equal(np.asarray(dev.col_mask_p2),
                                  host.col_mask_p2)
    np.testing.assert_allclose(np.asarray(dev.obj_row_p1), host.obj_row_p1,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev.obj_row_p2), host.obj_row_p2,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev.need_p1), host.need_p1)
    assert dev.n_vars == host.n_vars

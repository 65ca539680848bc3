"""f64 certification of batched/sharded verdicts (models/certify.py).

The single-LP engines KKT-check every optimum in host float64 and escalate
failures (``models/dense.py``); these tests pin the same guarantee onto the
batch paths — a sweep is exactly where one silent f32 mis-verdict hides
among 10k right answers.  Strategy per SURVEY.md §4: real engines vs scipy
HiGHS, no mocks.
"""
import numpy as np
import pytest
from scipy.optimize import linprog

from simplex_tpu.config import SolverConfig
from simplex_tpu.core.problem import LinearProgram
from simplex_tpu.models.batched import (
    BatchedSimplexSolver,
    _batch_tol,
    compile_batch_uniform,
    solve_lp_batch,
)
from simplex_tpu.models.certify import (
    certify_and_escalate,
    certify_bases_f64,
)


def _scipy_status(c, A, b, ops, maximize):
    A_ub, b_ub, A_eq, b_eq = [], [], [], []
    for i in range(len(b)):
        if ops[i] == -1:
            A_ub.append(A[i]); b_ub.append(b[i])
        elif ops[i] == 1:
            A_ub.append(-A[i]); b_ub.append(-b[i])
        else:
            A_eq.append(A[i]); b_eq.append(b[i])
    cs = np.asarray(c) * (-1 if maximize else 1)
    # presolve=False: HiGHS presolve reports feasible-but-unbounded LPs as
    # 'infeasible' (status 8 vs 10) — the simplex itself gets it right.
    return linprog(cs, A_ub=A_ub or None, b_ub=b_ub or None,
                   A_eq=A_eq or None, b_eq=b_eq or None, method="highs",
                   options={"presolve": False})


def _std_arrays(c, A, b, ops, maximize):
    cb = compile_batch_uniform(c, A, b, ops, maximize, dtype=np.float64)
    m_pad = cb.basis.shape[1]
    n_pad = cb.col_mask_p1.shape[1]
    return cb, dict(
        A_std=cb.T0[:, :m_pad, :n_pad], b_std=cb.T0[:, :m_pad, n_pad],
        c_std=cb.obj_row_p2[:, :n_pad],
        art_mask=cb.col_mask_p1 & ~cb.col_mask_p2,
        valid_mask=cb.col_mask_p2,
        c1_std=cb.obj_row_p1[:, :n_pad], mask_p1=cb.col_mask_p1)


def test_certify_accepts_true_optimum_rejects_wrong_basis():
    # max x1+x2 s.t. x1<=2, x2<=3  — optimum (2,3), basis = decision cols.
    c = np.array([[1.0, 1.0]])
    A = np.array([[[1.0, 0.0], [0.0, 1.0]]])
    b = np.array([[2.0, 3.0]])
    ops = np.array([-1, -1])
    cb, std = _std_arrays(c, A, b, ops, True)
    good = np.asarray(cb.basis, np.int64).copy()   # full padded width
    good[0, :2] = [0, 1]                           # x1, x2 basic
    cert, x_full, fun = certify_bases_f64(
        std["A_std"], std["b_std"], std["c_std"], std["art_mask"],
        std["valid_mask"], good)
    assert bool(cert[0])
    assert fun[0] == pytest.approx(-5.0)      # min-form of max 5
    # The all-slack basis (x=0) is feasible but NOT dual-feasible → reject.
    bad = np.asarray(cb.basis, np.int64)           # initial all-slack basis
    cert_bad, _, _ = certify_bases_f64(
        std["A_std"], std["b_std"], std["c_std"], std["art_mask"],
        std["valid_mask"], bad)
    assert not bool(cert_bad[0])


def test_escalation_corrects_a_lying_status():
    # Claim 'optimal' with a garbage basis: certification must fail and the
    # exact host engine must recover the true optimum.
    c = np.array([[3.0, 5.0]])
    A = np.array([[[1.0, 0.0], [0.0, 2.0], [3.0, 2.0]]])
    b = np.array([[4.0, 12.0, 18.0]])
    ops = np.array([-1, -1, -1])
    cb, std = _std_arrays(c, A, b, ops, True)
    lying_status = np.array([0], np.int32)
    garbage_basis = np.zeros((1, cb.basis.shape[1]), np.int64)  # singular

    fix = certify_and_escalate(
        lying_status, garbage_basis, std["A_std"], std["b_std"],
        std["c_std"], std["art_mask"], std["valid_mask"],
        lambda i: LinearProgram(c=c[i], A=A[i], b=b[i], ops=ops,
                                maximize=True),
        np.array([True]), cb.n_vars,
        c1_std=std["c1_std"], mask_p1=std["mask_p1"])
    assert bool(fix["escalated"][0])
    assert bool(fix["certified"][0])
    assert fix["status"][0] == 0
    assert fix["z"][0] == pytest.approx(36.0)      # reference anchor Z=36
    assert fix["x"][0] == pytest.approx([2.0, 6.0])


def test_infeasible_farkas_certificate_avoids_resolve():
    # x1 + x2 <= 1 and x1 + x2 >= 3: plainly infeasible.  The phase-1
    # certificate should certify WITHOUT escalation.
    B = 8
    c = np.tile([1.0, 2.0], (B, 1))
    A = np.tile([[[1.0, 1.0], [1.0, 1.0]]], (B, 1, 1))
    b = np.tile([1.0, 3.0], (B, 1))
    ops = np.array([-1, 1])
    res = BatchedSimplexSolver().solve_arrays(c, A, b, ops, maximize=False)
    assert np.all(res.status == 2)
    assert np.all(res.certified)
    assert res.n_escalated == 0


def test_batch_result_certified_on_optimal_sweep():
    rng = np.random.default_rng(7)
    B, m, n = 128, 6, 5
    A = rng.uniform(0.1, 2.0, (B, m, n))
    b = rng.uniform(1.0, 8.0, (B, m))
    c = rng.uniform(0.1, 1.0, (B, n))
    ops = np.full((m,), -1)
    res = BatchedSimplexSolver().solve_arrays(c, A, b, ops, maximize=True)
    assert res.n_optimal == B
    assert res.certified is not None and np.all(res.certified)
    assert res.basis is not None


def test_solve_many_certifies_and_matches_scipy():
    rng = np.random.default_rng(11)
    lps = []
    for _ in range(24):
        m = int(rng.integers(2, 5))
        lps.append(LinearProgram(
            c=rng.normal(size=3).round(2),
            A=rng.normal(size=(m, 3)).round(2),
            b=rng.uniform(-2, 6, size=m).round(2),
            ops=rng.choice([-1, 0, 1], size=m),
            maximize=bool(rng.integers(0, 2))))
    res = solve_lp_batch(lps)
    assert res.certified is not None
    for i, lp in enumerate(lps):
        ref = _scipy_status(lp.c, lp.A, lp.b, lp.ops, lp.maximize)
        if ref.status == 0:
            assert res.status[i] == 0, i
            zs = -ref.fun if lp.maximize else ref.fun
            assert res.z[i] == pytest.approx(zs, rel=1e-6, abs=1e-6), i
        else:
            assert res.status[i] == ref.status, i
        assert res.certified[i] or res.status[i] == 1


def test_ten_thousand_instance_sweep_zero_status_mismatches():
    """VERDICT r2 item 2 done-criterion: a 10k random mixed-ops sweep with
    zero status mismatches vs scipy, reporting how many escalated."""
    rng = np.random.default_rng(42)
    B, m, n = 10_000, 5, 4
    A = rng.normal(size=(B, m, n)).round(2)
    b = rng.uniform(-3, 8, size=(B, m)).round(2)
    c = rng.normal(size=(B, n)).round(2)
    ops = np.array([-1, 1, 0, -1, 1])
    res = BatchedSimplexSolver().solve_arrays(c, A, b, ops, maximize=False)
    assert res.certified is not None

    mismatches = []
    for i in range(B):
        ref = _scipy_status(c[i], A[i], b[i], ops, False)
        if ref.status == 0:
            if res.status[i] != 0 or abs(res.fun[i] - ref.fun) > \
                    1e-6 * (1.0 + abs(ref.fun)):
                mismatches.append((i, ref.status, int(res.status[i])))
        elif res.status[i] != ref.status:
            mismatches.append((i, ref.status, int(res.status[i])))
    assert not mismatches, mismatches[:10]
    # Observability: the sweep reports its escalation count.
    assert res.n_escalated >= 0
    print(f"\n10k sweep: {res.n_optimal} optimal, "
          f"{int(np.sum(res.status == 2))} infeasible, "
          f"{int(np.sum(res.status == 3))} unbounded, "
          f"{res.n_escalated} escalated, "
          f"{int(res.certified.sum())} certified")


def test_raw_certifier_agrees_with_lu_certifier():
    """VERDICT r3 item 2: the structured raw-data certifier (k×k LU via
    block elimination of the unit basis columns) must reach the same
    verdicts as the dense batched-LU path on the same solved batches —
    statuses, certification masks, objectives."""
    from simplex_tpu.models.batched import certify_uniform_result
    from simplex_tpu.models.certify import certify_and_escalate_raw

    rng = np.random.default_rng(41)
    B, m, n = 24, 10, 6
    A = rng.normal(size=(B, m, n)).round(2)
    b = rng.uniform(-3, 8, size=(B, m)).round(2)
    c = rng.normal(size=(B, n)).round(2)
    ops = rng.choice([-1, 0, 1], size=m)
    cfg = SolverConfig(certify=False)
    res = BatchedSimplexSolver(cfg).solve_arrays(c, A, b, ops,
                                                 maximize=False)
    raw = certify_and_escalate_raw(res.status, res.basis, c, A, b, ops,
                                   np.zeros(B, bool))
    import dataclasses
    lu = certify_uniform_result(
        dataclasses.replace(res), c, A, b, ops, False)
    np.testing.assert_array_equal(raw["status"], lu.status)
    np.testing.assert_array_equal(raw["certified"], lu.certified)
    ok = raw["status"] == 0
    np.testing.assert_allclose(raw["z"][ok], lu.z[ok], rtol=1e-9,
                               atol=1e-9)
    # And both must match scipy status-for-status.
    for i in range(B):
        ref = _scipy_status(c[i], A[i], b[i], ops, False)
        assert ref.status == raw["status"][i], i
        if ref.status == 0:
            assert raw["z"][i] == pytest.approx(ref.fun, rel=1e-6,
                                                abs=1e-6)


def test_raw_certifier_rejects_wrong_basis_and_escalates():
    """A lying 'optimal' status with a garbage basis must fail the raw
    certificate and be corrected by host escalation — same contract as
    the LU path's test above."""
    from simplex_tpu.models.certify import certify_and_escalate_raw

    c = np.array([[3.0, 5.0]])
    A = np.array([[[1.0, 0.0], [0.0, 2.0], [3.0, 2.0]]])
    b = np.array([[4.0, 12.0, 18.0]])
    ops = np.array([-1, -1, -1])
    lying = np.array([0], np.int32)
    garbage = np.zeros((1, 3), np.int64)           # duplicate columns
    fix = certify_and_escalate_raw(lying, garbage, c, A, b, ops,
                                   np.array([True]))
    assert bool(fix["escalated"][0]) and bool(fix["certified"][0])
    assert fix["status"][0] == 0
    assert fix["z"][0] == pytest.approx(36.0)
    assert fix["x"][0] == pytest.approx([2.0, 6.0])


def test_batch_tol_honors_f64_request():
    cfg = SolverConfig(tol=1e-9)
    assert _batch_tol(cfg, np.float64) == 1e-9
    assert _batch_tol(cfg, np.float32) == 1e-6
    cfg2 = SolverConfig(tol=1e-4)
    assert _batch_tol(cfg2, np.float64) == 1e-4
    assert _batch_tol(cfg2, np.float32) == 1e-4


def test_certify_can_be_disabled():
    cfg = SolverConfig(certify=False)
    c = np.array([[1.0, 1.0]])
    A = np.array([[[1.0, 0.0], [0.0, 1.0]]])
    b = np.array([[2.0, 3.0]])
    res = BatchedSimplexSolver(cfg).solve_arrays(
        c, A, b, np.array([-1, -1]), maximize=True)
    assert res.certified is None
    assert res.z[0] == pytest.approx(5.0, rel=1e-5)


def test_sweep_certifier_matches_scipy_and_flags_wrong_basis():
    """certify_sweep_le_f64 (the vectorized 1M-exact-sweep path): certified
    optima match scipy; a corrupted basis is escalated and corrected."""
    from simplex_tpu.models.certify import certify_sweep_le_f64
    from simplex_tpu.models.batched import BatchedSimplexSolver

    rng = np.random.default_rng(31)
    B, m, n = 16, 12, 18
    A = rng.uniform(0.05, 1.0, (B, m, n))
    b = rng.uniform(1.0, 5.0, (B, m))
    c = rng.uniform(0.1, 1.0, (B, n))
    ops = np.full(m, -1)
    res = BatchedSimplexSolver(SolverConfig(certify=False)).solve_arrays(
        c, A, b, ops, maximize=True)
    status = np.array(res.status)
    basis = np.array(res.basis)
    basis[3, :4] = 0                      # duplicate columns: singular B
    fix = certify_sweep_le_f64(status, basis, c, A, b, True)
    assert fix is not None
    assert fix["certified"].all()
    assert fix["escalated"][3] and not fix["escalated"][:3].any()
    for i in range(B):
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
        np.testing.assert_allclose(fix["z"][i], -ref.fun, rtol=1e-6,
                                   atol=1e-8, err_msg=str(i))


def test_sweep_certifier_bounded_at_upper():
    """Bounded KKT via the vectorized sweep certifier: optima at upper
    bounds certify without escalation and match scipy."""
    from simplex_tpu.models.certify import certify_sweep_le_f64
    from simplex_tpu.models.batched import BatchedSimplexSolver

    rng = np.random.default_rng(32)
    B, m, n = 12, 10, 14
    A = rng.uniform(0.05, 1.0, (B, m, n))
    b = rng.uniform(2.0, 6.0, (B, m))
    c = rng.uniform(0.1, 1.0, (B, n))
    ub = rng.uniform(0.3, 3.0, (B, n))
    ops = np.full(m, -1)
    res = BatchedSimplexSolver(SolverConfig(certify=False)).solve_arrays(
        c, A, b, ops, maximize=True, ub=ub)
    fix = certify_sweep_le_f64(np.array(res.status), np.array(res.basis),
                               c, A, b, True, ub=ub,
                               at_upper=np.array(res.at_upper))
    assert fix is not None and fix["certified"].all()
    assert not fix["escalated"].any(), "bounded sweep should certify direct"
    for i in range(B):
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i],
                      bounds=list(zip(np.zeros(n), ub[i])), method="highs")
        np.testing.assert_allclose(fix["z"][i], -ref.fun, rtol=1e-6,
                                   atol=1e-8, err_msg=str(i))


def test_sweep_certifier_declines_negative_rhs():
    """b < 0 rows (flips create artificials): the fast path declines and
    certify_uniform_result falls through to the general certifier."""
    from simplex_tpu.models.certify import certify_sweep_le_f64
    from simplex_tpu.models.batched import BatchedSimplexSolver

    rng = np.random.default_rng(33)
    B, m, n = 6, 8, 10
    A = rng.uniform(-1.0, 1.0, (B, m, n))
    b = rng.uniform(-2.0, 5.0, (B, m))
    c = rng.uniform(0.1, 1.0, (B, n))
    assert certify_sweep_le_f64(
        np.zeros(B, np.int32), np.zeros((B, m), np.int32),
        c, A, b, True) is None
    # End-to-end still certifies through the fallback path.
    res = BatchedSimplexSolver(SolverConfig(certify=True)).solve_arrays(
        c, A, b, np.full(m, -1), maximize=True)
    assert res.certified is not None and res.certified.all()
    for i in range(B):
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
        assert (ref.status == 0) == bool(res.success[i]), i
        if ref.status == 0:
            np.testing.assert_allclose(res.z[i], -ref.fun, rtol=1e-6,
                                       atol=1e-8, err_msg=str(i))

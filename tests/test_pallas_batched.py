"""The fused Pallas batched pivot step must match the XLA formulation.

Runs the kernel in interpreter mode (CPU CI has no TPU); on TPU hardware the
compiled kernel is exercised by the same entry points via backend="pallas".
"""
import numpy as np
import jax.numpy as jnp
import pytest

from simplex_tpu.models.batched import BatchedSimplexSolver, compile_batch_uniform
from simplex_tpu.config import SolverConfig
from simplex_tpu.ops import batched as bops


def _random_batch(seed, B=12, m=9, n=13, ops=None):
    rng = np.random.default_rng(seed)
    A = rng.uniform(0.1, 2.0, (B, m, n))
    c = rng.uniform(0.5, 3.0, (B, n))
    b = rng.uniform(5.0, 25.0, (B, m))
    if ops is None:
        ops = np.full(m, -1)
    return c, A, b, np.asarray(ops)


def _solve_both(c, A, b, ops, **kw):
    cb = compile_batch_uniform(c, A, b, ops, maximize=True)
    args = [jnp.asarray(x) for x in
            (cb.T0, cb.basis, cb.col_mask_p1, cb.col_mask_p2,
             cb.obj_row_p1, cb.obj_row_p2, cb.need_p1)]
    out_x = bops.solve_tableau_batch(*args, backend="xla", **kw)
    out_p = bops.solve_tableau_batch(*args, backend="pallas_interpret", **kw)
    return out_x, out_p


def _assert_match(out_x, out_p):
    names = ["T", "basis", "status", "iters", "pivots"]
    for name, a, b in zip(names, out_x, out_p):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_fused_step_matches_xla_le_only():
    out_x, out_p = _solve_both(*_random_batch(0))
    _assert_match(out_x, out_p)
    assert (np.asarray(out_p[2]) == 0).all()  # all-<= with b>0: all optimal


def test_fused_step_matches_xla_mixed_ops():
    # >= and = rows force phase 1 (and its flip path) through the kernel.
    ops = np.array([-1, -1, -1, -1, 1, 1, 0, 0, -1])
    out_x, out_p = _solve_both(*_random_batch(1, ops=ops))
    _assert_match(out_x, out_p)


def test_fused_step_matches_xla_with_bland():
    # Force Bland pricing from the start to cover that kernel branch.
    out_x, out_p = _solve_both(*_random_batch(2), bland_after=0)
    _assert_match(out_x, out_p)


def test_solver_config_backend_plumbs_through():
    c, A, b, ops = _random_batch(3, B=6)
    res = BatchedSimplexSolver(
        SolverConfig(batched_backend="pallas_interpret")
    ).solve_arrays(c, A, b, ops, maximize=True)
    ref = BatchedSimplexSolver(
        SolverConfig(batched_backend="xla")
    ).solve_arrays(c, A, b, ops, maximize=True)
    assert (res.status == ref.status).all()
    np.testing.assert_allclose(res.z[res.success], ref.z[ref.success],
                               rtol=1e-4)


@pytest.mark.parametrize("B,m,n", [(4, 3, 2), (16, 30, 50)])
def test_fused_step_shapes(B, m, n):
    out_x, out_p = _solve_both(*_random_batch(4, B=B, m=m, n=n))
    _assert_match(out_x, out_p)


def test_fused_step_matches_xla_devex():
    """Devex weights thread identically through both backends (VERDICT r1
    next-round #4): same pivot sequence, same statuses, same tableaus."""
    ops = np.array([-1, -1, -1, -1, 1, 1, 0, 0, -1])
    out_x, out_p = _solve_both(*_random_batch(5, ops=ops), devex=True)
    _assert_match(out_x, out_p)


def test_devex_reduces_pivots_batched():
    """Devex pricing must not exceed Dantzig's pivot counts on a non-trivial
    batch (it typically cuts them substantially on larger LPs)."""
    c, A, b, ops = _random_batch(6, B=8, m=24, n=40)
    cb = compile_batch_uniform(c, A, b, ops, maximize=True)
    args = [jnp.asarray(x) for x in
            (cb.T0, cb.basis, cb.col_mask_p1, cb.col_mask_p2,
             cb.obj_row_p1, cb.obj_row_p2, cb.need_p1)]
    out_dv = bops.solve_tableau_batch(*args, backend="xla", devex=True)
    out_dz = bops.solve_tableau_batch(*args, backend="xla", devex=False)
    assert (np.asarray(out_dv[2]) == 0).all()
    assert (np.asarray(out_dz[2]) == 0).all()
    assert np.asarray(out_dv[4]).sum() <= np.asarray(out_dz[4]).sum()


def _solve_both_bounded(c, A, b, ops, ub, **kw):
    cb = compile_batch_uniform(c, A, b, ops, maximize=True, ub=ub)
    args = [jnp.asarray(x) for x in
            (cb.T0, cb.basis, cb.col_mask_p1, cb.col_mask_p2,
             cb.obj_row_p1, cb.obj_row_p2, cb.need_p1, cb.ub_ext)]
    out_x = bops.solve_tableau_batch_bounded(*args, backend="xla", **kw)
    out_p = bops.solve_tableau_batch_bounded(
        *args, backend="pallas_interpret", **kw)
    return out_x, out_p


def _assert_match_bounded(out_x, out_p):
    names = ["T", "basis", "at_upper", "status", "iters", "pivots"]
    for name, a, b in zip(names, out_x, out_p):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_fused_bounded_step_matches_xla_le_only():
    c, A, b, ops = _random_batch(10)
    rng = np.random.default_rng(100)
    ub = rng.uniform(0.5, 6.0, c.shape)   # tight: flips + at-upper optima
    out_x, out_p = _solve_both_bounded(c, A, b, ops, ub)
    _assert_match_bounded(out_x, out_p)
    assert (np.asarray(out_p[3]) == 0).all()
    # The bounded machinery must actually engage on this batch.
    assert np.asarray(out_p[2]).any(), "no at-upper columns exercised"


def test_fused_bounded_step_matches_xla_mixed_ops():
    # >= and = rows force phase 1, artificial-exit rows, and the
    # bounded eviction path through the kernel.
    ops = np.array([-1, -1, -1, -1, 1, 1, 0, 0, -1])
    c, A, b, _ = _random_batch(11, ops=ops)
    rng = np.random.default_rng(101)
    ub = rng.uniform(2.0, 30.0, c.shape)
    out_x, out_p = _solve_both_bounded(c, A, b, ops, ub)
    _assert_match_bounded(out_x, out_p)


def test_fused_bounded_step_matches_xla_bland():
    c, A, b, ops = _random_batch(12)
    rng = np.random.default_rng(102)
    ub = rng.uniform(0.5, 8.0, c.shape)
    out_x, out_p = _solve_both_bounded(c, A, b, ops, ub, bland_after=0)
    _assert_match_bounded(out_x, out_p)


def test_fused_bounded_step_matches_xla_devex():
    ops = np.array([-1, -1, -1, -1, 1, 1, 0, 0, -1])
    c, A, b, _ = _random_batch(13, ops=ops)
    rng = np.random.default_rng(103)
    ub = rng.uniform(1.0, 20.0, c.shape)
    out_x, out_p = _solve_both_bounded(c, A, b, ops, ub, devex=True)
    _assert_match_bounded(out_x, out_p)


def test_fused_bounded_solver_matches_scipy():
    """End-to-end: bounded pallas_interpret backend vs scipy on the same
    instances (optimum may sit AT the bounds)."""
    from scipy.optimize import linprog

    c, A, b, ops = _random_batch(14, B=8)
    rng = np.random.default_rng(104)
    ub = rng.uniform(0.5, 5.0, c.shape)
    res = BatchedSimplexSolver(
        SolverConfig(batched_backend="pallas_interpret")
    ).solve_arrays(c, A, b, ops, maximize=True, ub=ub)
    for i in range(c.shape[0]):
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i],
                      bounds=list(zip(np.zeros_like(ub[i]), ub[i])),
                      method="highs")
        assert ref.success and bool(res.success[i])
        np.testing.assert_allclose(res.z[i], -ref.fun, rtol=1e-5,
                                   atol=1e-6)


def test_phase2_only_matches_default_unbounded():
    """The chunked no-cond fast path (phase2_only=True) must agree with
    the default driver on all-<= batches (statuses exact, objectives to
    solver tolerance — the refactor cadence differs by one step)."""
    c, A, b, ops = _random_batch(20, B=16, m=12, n=18)
    cb = compile_batch_uniform(c, A, b, ops, maximize=True)
    args = [jnp.asarray(x) for x in
            (cb.T0, cb.basis, cb.col_mask_p1, cb.col_mask_p2,
             cb.obj_row_p1, cb.obj_row_p2, cb.need_p1)]
    out_d = bops.solve_tableau_batch(*args, backend="xla",
                                     phase2_only=False)
    out_f = bops.solve_tableau_batch(*args, backend="xla",
                                     phase2_only=True)
    np.testing.assert_array_equal(np.asarray(out_d[2]),
                                  np.asarray(out_f[2]))
    zd = np.asarray(out_d[0][:, -1, -1])
    zf = np.asarray(out_f[0][:, -1, -1])
    np.testing.assert_allclose(zd, zf, rtol=1e-5, atol=1e-5)
    # Backend parity stays exact within the fast path.
    out_p = bops.solve_tableau_batch(*args, backend="pallas_interpret",
                                     phase2_only=True)
    _assert_match(out_f, out_p)


def test_phase2_only_matches_default_bounded():
    c, A, b, ops = _random_batch(21, B=12, m=9, n=13)
    rng = np.random.default_rng(210)
    ub = rng.uniform(0.5, 6.0, c.shape)
    cb = compile_batch_uniform(c, A, b, ops, maximize=True, ub=ub)
    args = [jnp.asarray(x) for x in
            (cb.T0, cb.basis, cb.col_mask_p1, cb.col_mask_p2,
             cb.obj_row_p1, cb.obj_row_p2, cb.need_p1, cb.ub_ext)]
    out_d = bops.solve_tableau_batch_bounded(*args, backend="xla",
                                             phase2_only=False)
    out_f = bops.solve_tableau_batch_bounded(*args, backend="xla",
                                             phase2_only=True)
    np.testing.assert_array_equal(np.asarray(out_d[3]),
                                  np.asarray(out_f[3]))
    np.testing.assert_allclose(np.asarray(out_d[0][:, -1, -1]),
                               np.asarray(out_f[0][:, -1, -1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_d[2]),
                                  np.asarray(out_f[2]))  # at_upper
    out_p = bops.solve_tableau_batch_bounded(
        *args, backend="pallas_interpret", phase2_only=True)
    _assert_match_bounded(out_f, out_p)


def test_phase2_only_long_run_crosses_refactor_boundary():
    """A batch needing >refactor_every pivots exercises the chunk
    boundary refactor of the fast path; verdicts must match scipy."""
    from scipy.optimize import linprog

    rng = np.random.default_rng(22)
    B, m, n = 4, 24, 40
    A = rng.uniform(0.1, 2.0, (B, m, n))
    c = rng.uniform(0.5, 3.0, (B, n))
    b = rng.uniform(5.0, 25.0, (B, m))
    ops = np.full(m, -1)
    cb = compile_batch_uniform(c, A, b, ops, maximize=True)
    args = [jnp.asarray(x) for x in
            (cb.T0, cb.basis, cb.col_mask_p1, cb.col_mask_p2,
             cb.obj_row_p1, cb.obj_row_p2, cb.need_p1)]
    out = bops.solve_tableau_batch(*args, backend="xla",
                                   phase2_only=True, refactor_every=8)
    st = np.asarray(out[2])
    assert (st == 0).all()
    for i in range(B):
        ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
        # -T[-1,-1] is the min-form objective == ref.fun (c negated).
        np.testing.assert_allclose(-np.asarray(out[0][i, -1, -1]),
                                   ref.fun, rtol=1e-4)


def test_single_lp_fused_pivot_matches_xla():
    """The large-tableau fused pivot kernel (ops/pallas_pivot.py) must
    match ops.tableau.pivot_update exactly (interpreter mode off-TPU)."""
    import jax.numpy as jnp
    from simplex_tpu.ops.pallas_pivot import pivot_update_fused
    from simplex_tpu.ops.tableau import pivot_update

    rng = np.random.default_rng(9)
    R, W = 512, 512
    T = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
    basis = jnp.arange(R - 1, dtype=jnp.int32)
    for r, s in [(3, 7), (0, 0), (R - 2, W - 2)]:
        ref, _ = pivot_update(T, basis, jnp.int32(r), jnp.int32(s))
        got = pivot_update_fused(T, r, s, block_r=128, block_c=128,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

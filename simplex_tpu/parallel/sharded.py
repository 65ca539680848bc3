"""Multi-chip sharded simplex: row-block partitioning with collectives.

BASELINE config 5 ("100k-constraint LP row-block sharded across a multi-host
pod with all-reduce pricing + ratio-test collectives").  The reference has no
distributed execution at all (SURVEY.md §2.4); this is the TPU-native scale
path: constraint rows of the tableau live block-partitioned across the
``row`` mesh axis, independent LP instances across the ``batch`` axis.

Communication pattern per pivot (SURVEY.md §5.7):
  * pricing           — replicated (the objective row is replicated);
  * ratio test        — local masked min + ``lax.pmin`` over ``row``
                        (value), then a second ``pmin`` on a Bland row key
                        for the global tie-break;
  * pivot row         — ``lax.psum`` of the owner's normalized row
                        (a broadcast expressed as a masked all-reduce);
  * rank-1 update     — embarrassingly row-parallel, no communication.

So each iteration moves O(n_pad) floats over ICI (one row + two scalars),
while the O(m_loc * n_pad) update runs at local HBM bandwidth — the design
the scaling-book recipe prescribes for this reduction structure.

Artificial-variable handling differs from the single-chip kernel: instead of
a post-phase-1 eviction sweep (a global row loop), basic artificials are
driven out by a ratio-test preference — any row whose basic variable is
artificial and has a nonzero pivot-column entry gets ratio 0 and wins ties,
so it leaves the basis on the first pivot that touches it.  This keeps every
step O(1) in collectives.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import (
    STATUS_INFEASIBLE,
    STATUS_ITERATION_LIMIT,
    STATUS_OPTIMAL,
    STATUS_UNBOUNDED,
)

RUNNING = -1
_INT_MAX = jnp.iinfo(jnp.int32).max
_ART_BONUS = 1 << 20  # tie-break bonus: artificial-basic rows leave first


def make_mesh(batch: int = 1, row: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (batch, row) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    assert batch * row <= len(devices), (
        f"mesh {batch}x{row} needs {batch * row} devices, "
        f"have {len(devices)}"
    )
    arr = np.asarray(devices[: batch * row]).reshape(batch, row)
    return Mesh(arr, axis_names=("batch", "row"))


def _sharded_body(T_loc, basis_loc, obj, col_mask_p1, col_mask_p2,
                  art_mask, obj_row_p1, obj_row_p2, need_p1,
                  row_valid_loc, tol, feas_tol, max_iters, bland_after,
                  axis="row"):
    """Per-device while_loop over pivots.  Shapes (device-local):

    T_loc:        (B, m_loc, N+1) constraint-row block (no objective row)
    basis_loc:    (B, m_loc) int32
    obj:          (B, N+1) replicated objective row (priced out)
    col_mask_*:   (B, N) replicated
    art_mask:     (B, N) replicated — artificial columns
    obj_row_*:    (B, N+1) replicated raw cost rows
    need_p1:      (B,) replicated
    row_valid_loc:(B, m_loc) — False on padding rows
    """
    Bl = T_loc.shape[0]
    dt = T_loc.dtype

    b_scale = 1.0 + lax.pmax(
        jnp.max(jnp.where(row_valid_loc, jnp.abs(T_loc[:, :, -1]), 0.0),
                axis=1),
        axis,
    )

    # Extended artificial mask including the RHS slot (basis may point at
    # padding unit columns which are never artificial).
    art_ext = jnp.concatenate([art_mask, jnp.zeros((Bl, 1), bool)], axis=1)

    phase0 = jnp.where(need_p1, jnp.int32(1), jnp.int32(2))

    def cond(state):
        _T, _basis, _obj, _phase, status, iters = state
        return jnp.any(status == RUNNING) & (iters < max_iters)

    def body(state):
        T_loc, basis_loc, obj, phase, status, iters = state
        live = status == RUNNING
        in_p1 = phase == 1
        col_mask = jnp.where(in_p1[:, None], col_mask_p1, col_mask_p2)
        use_bland = iters >= bland_after

        # ---- pricing (replicated compute, no comms) -------------------- #
        rc = jnp.where(col_mask, obj[:, :-1], jnp.inf)
        eligible = rc < -tol
        s = jnp.where(use_bland, jnp.argmax(eligible, axis=-1),
                      jnp.argmin(rc, axis=-1))
        optimal = ~jnp.any(eligible, axis=-1)

        # ---- ratio test (local + pmin collectives) --------------------- #
        # Column extraction as a one-hot MXU contraction (lane-axis
        # take_along_axis is a slow multi-pass gather on TPU).
        s_hot = jax.nn.one_hot(s, T_loc.shape[2], dtype=dt)  # (B, N+1)
        col_loc = jnp.einsum("bmn,bn->bm", T_loc, s_hot)     # (B, m_loc)
        rhs_loc = T_loc[:, :, -1]
        is_art_row = jnp.take_along_axis(art_ext, basis_loc, axis=1)
        positive = (col_loc > tol) & row_valid_loc
        # Phase 2 only: artificial-basic rows (at zero level after a
        # feasible phase 1) with any nonzero entry leave at ratio 0.  In
        # phase 1 artificials carry the RHS and must obey the normal test.
        art_exit = ((~in_p1)[:, None] & is_art_row
                    & (jnp.abs(col_loc) > tol) & row_valid_loc)
        ratios = jnp.where(positive, rhs_loc / jnp.where(positive, col_loc,
                                                         1.0), jnp.inf)
        ratios = jnp.where(art_exit, 0.0, ratios)
        cand = positive | art_exit

        local_min = jnp.min(ratios, axis=1)                  # (B,)
        global_min = lax.pmin(local_min, axis)
        unbounded = (~optimal) & jnp.isinf(global_min)

        eps = jnp.finfo(dt).eps
        near = cand & (
            ratios <= (global_min
                       + 64.0 * eps * (1.0 + jnp.abs(global_min)))[:, None]
        )
        # Bland tie-break on the global basis index; artificial rows get a
        # large negative bonus so they win ties and leave the basis.
        key = jnp.where(
            near,
            basis_loc - jnp.where(is_art_row, _ART_BONUS, 0),
            _INT_MAX,
        )
        local_key = jnp.min(key, axis=1)
        global_key = lax.pmin(local_key, axis)

        owner_rows = near & (
            (basis_loc - jnp.where(is_art_row, _ART_BONUS, 0))
            == global_key[:, None]
        )
        has_owner = jnp.any(owner_rows, axis=1)              # (B,)
        r_loc = jnp.argmax(owner_rows, axis=1)               # (B,)

        # ---- pivot-row broadcast (psum of masked contribution) --------- #
        r_hot = jax.nn.one_hot(r_loc, T_loc.shape[1], dtype=dt)  # (B, m_loc)
        piv_row_own = jnp.einsum("bm,bmn->bn", r_hot, T_loc)     # (B, N+1)
        pivot_own = jnp.einsum("bn,bn->b", piv_row_own, s_hot)
        safe = jnp.where(has_owner & (jnp.abs(pivot_own) > 0), pivot_own, 1.0)
        contrib = jnp.where(has_owner[:, None], piv_row_own / safe[:, None],
                            0.0)
        piv_row = lax.psum(contrib, axis)                    # (B, N+1)

        # ---- decide action per instance -------------------------------- #
        want_stop = (optimal | unbounded) & live
        p1_done = want_stop & in_p1
        p1_obj = -obj[:, -1]
        infeasible = p1_done & (p1_obj > feas_tol * b_scale)
        to_p2 = p1_done & ~infeasible

        finish_p2 = want_stop & ~in_p1
        status = jnp.where(
            infeasible, STATUS_INFEASIBLE,
            jnp.where(finish_p2 & optimal, STATUS_OPTIMAL,
                      jnp.where(finish_p2 & unbounded, STATUS_UNBOUNDED,
                                status)),
        )
        active = live & ~want_stop

        # ---- rank-1 update (row-parallel, no comms) -------------------- #
        T_new = T_loc - col_loc[:, :, None] * piv_row[:, None, :]
        own_hot = owner_rows  # (B, m_loc) — at most one True per instance
        T_new = jnp.where(own_hot[:, :, None], piv_row[:, None, :], T_new)
        T_loc = jnp.where(active[:, None, None], T_new, T_loc)
        basis_loc = jnp.where(active[:, None] & own_hot,
                              s[:, None].astype(basis_loc.dtype), basis_loc)

        # Objective-row update (replicated, consistent across devices).
        obj_s = jnp.einsum("bn,bn->b", obj, s_hot)
        obj_new = obj - obj_s[:, None] * piv_row
        obj = jnp.where(active[:, None], obj_new, obj)

        # ---- phase flip: install + price out the phase-2 objective ----- #
        # costs_B = obj_row_p2[basis] summed against local rows, psum'ed.
        # Gated: the O(B·m_loc·N) contraction + psum only run on iterations
        # where some instance actually flips.  ``to_p2`` derives from
        # replicated state and pmin-reduced values, so every device takes
        # the same branch — the collective inside the cond is safe.
        def flip(args):
            obj, phase = args
            basis_costs = jnp.take_along_axis(obj_row_p2, basis_loc, axis=1)
            local_dot = jnp.einsum("bm,bmn->bn",
                                   jnp.where(row_valid_loc, basis_costs, 0.0),
                                   T_loc)
            priced = obj_row_p2 - lax.psum(local_dot, axis)
            obj = jnp.where(to_p2[:, None], priced, obj)
            phase = jnp.where(to_p2, jnp.int32(2), phase)
            return obj, phase

        obj, phase = lax.cond(jnp.any(to_p2), flip, lambda a: a,
                              (obj, phase))

        return (T_loc, basis_loc, obj, phase, status, iters + 1)

    state0 = (T_loc, basis_loc, obj, phase0,
              jnp.full((Bl,), RUNNING, jnp.int32), jnp.int32(0))
    T_loc, basis_loc, obj, phase, status, iters = lax.while_loop(
        cond, body, state0
    )
    status = jnp.where(status == RUNNING, STATUS_ITERATION_LIMIT, status)
    return T_loc, basis_loc, obj, status, iters


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "tol", "feas_tol", "max_iters", "bland_after"),
)
def solve_tableau_sharded(T_rows, basis, obj, col_mask_p1, col_mask_p2,
                          art_mask, obj_row_p1, obj_row_p2, need_p1,
                          row_valid, mesh: Mesh,
                          tol: float = 1e-6, feas_tol: float = 1e-5,
                          max_iters: int = 4096, bland_after: int = 1024):
    """Solve LPs with constraint rows sharded over ``mesh`` axis ``row`` and
    instances sharded over ``batch``.

    Global shapes:
      T_rows:   (B, m_pad, N+1)  — constraint rows only (objective separate)
      basis:    (B, m_pad) int32
      obj:      (B, N+1)         — initial priced-out objective row
      masks:    (B, N) / (B, m_pad) as in the batched kernel
      need_p1:  (B,) bool
      row_valid:(B, m_pad) bool  — False on padding rows

    Returns ``(T_rows, basis, obj, status, iters)`` with the same global
    shapes/shardings.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec_T = P("batch", "row", None)
    spec_rows = P("batch", "row")
    spec_rep = P("batch", None)
    spec_b = P("batch")

    fn = shard_map(
        functools.partial(_sharded_body, tol=tol, feas_tol=feas_tol,
                          max_iters=max_iters, bland_after=bland_after),
        mesh=mesh,
        in_specs=(spec_T, spec_rows, spec_rep, spec_rep, spec_rep,
                  spec_rep, spec_rep, spec_rep, spec_b, spec_rows),
        out_specs=(spec_T, spec_rows, spec_rep, spec_b, P()),
        check_vma=False,
    )
    return fn(T_rows, basis, obj, col_mask_p1, col_mask_p2, art_mask,
              obj_row_p1, obj_row_p2, need_p1, row_valid)


def extract_solution_sharded(T_rows, basis, obj, row_valid, n_vars: int):
    """Recover (x, z_min) from sharded results (host-side, small gathers)."""
    rhs = np.where(np.asarray(row_valid), np.asarray(T_rows)[:, :, -1], 0.0)
    basis = np.asarray(basis)
    B = rhs.shape[0]
    x = np.zeros((B, n_vars))
    for i in range(B):
        sel = basis[i] < n_vars
        x[i, basis[i][sel]] = rhs[i][sel]
    z_min = -np.asarray(obj)[:, -1]
    return x, z_min


def solve_arrays_sharded(c, A, b, ops, maximize=True, mesh: Mesh = None,
                         dtype=np.float32, tol: float = 1e-6,
                         max_iters: int = 4096):
    """Convenience driver: uniform array batch → sharded solve → results.

    Pads the batch to the ``batch`` mesh axis and rows to a multiple of the
    ``row`` axis, places shards with ``jax.device_put``, runs the sharded
    kernel, and extracts per-instance solutions host-side.
    """
    from ..models.batched import compile_batch_uniform

    if mesh is None:
        mesh = make_mesh(batch=1, row=len(jax.devices()))
    n_batch = mesh.shape["batch"]
    n_row = mesh.shape["row"]

    c = np.asarray(c, np.float64)
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    B, m, n = A.shape

    B_pad = ((B + n_batch - 1) // n_batch) * n_batch
    if B_pad != B:
        # Pad with trivial feasible instances (x=0 optimal).
        A = np.concatenate([A, np.zeros((B_pad - B, m, n))])
        extra_b = np.ones((B_pad - B, m))
        b = np.concatenate([b, extra_b])
        c = np.concatenate([c, np.zeros((B_pad - B, n))])

    cb = compile_batch_uniform(
        c, A, b, ops, maximize, row_pad=n_row, dtype=np.dtype(dtype),
        align_total=False,
    )
    m_pad = cb.basis.shape[1]
    assert m_pad % n_row == 0

    T_rows = cb.T0[:, :-1, :]
    obj = cb.T0[:, -1, :]
    row_valid = np.zeros((B_pad, m_pad), bool)
    row_valid[:, :m] = True
    art_mask = cb.col_mask_p1 & ~cb.col_mask_p2

    sh_T = NamedSharding(mesh, P("batch", "row", None))
    sh_rows = NamedSharding(mesh, P("batch", "row"))
    sh_rep = NamedSharding(mesh, P("batch", None))
    sh_b = NamedSharding(mesh, P("batch"))

    args = (
        jax.device_put(jnp.asarray(T_rows), sh_T),
        jax.device_put(jnp.asarray(cb.basis), sh_rows),
        jax.device_put(jnp.asarray(obj), sh_rep),
        jax.device_put(jnp.asarray(cb.col_mask_p1), sh_rep),
        jax.device_put(jnp.asarray(cb.col_mask_p2), sh_rep),
        jax.device_put(jnp.asarray(art_mask), sh_rep),
        jax.device_put(jnp.asarray(cb.obj_row_p1), sh_rep),
        jax.device_put(jnp.asarray(cb.obj_row_p2), sh_rep),
        jax.device_put(jnp.asarray(cb.need_p1), sh_b),
        jax.device_put(jnp.asarray(row_valid), sh_rows),
    )
    T_out, basis_out, obj_out, status, iters = solve_tableau_sharded(
        *args, mesh=mesh, tol=tol, max_iters=max_iters
    )
    x, z_min = extract_solution_sharded(T_out, basis_out, obj_out,
                                        row_valid, cb.n_vars)
    x = np.maximum(x[:B], 0.0)
    fun = z_min[:B]
    status = np.asarray(status)[:B]
    z = np.where(np.asarray(cb.maximize[:B]), -fun, fun) + 0.0
    ok = status == STATUS_OPTIMAL
    return {
        "x": np.where(ok[:, None], x, np.nan),
        "z": np.where(ok, z, np.nan),
        "status": status,
        "iters": int(iters),
    }

"""Pallas fused batched pivot step: pricing + ratio test + rank-1 update.

The batched while-loop body in ``ops/batched.py`` is, in its pure-XLA form,
~20 small HLO ops per iteration (masked argmins, one-hot einsum gathers, the
rank-1 update, mask merges).  At the flagship shape (B=1024 instances of
30x50) each op is far too small to hide its fixed launch/HBM-turnaround
cost, so an iteration costs ~2 ms against a ~30 us bandwidth bound — the
loop is op-count-bound, not bandwidth-bound (docs/performance.md).

This kernel fuses the ENTIRE per-iteration step for a block of instances
into one ``pallas_call``: the tableau block is read from HBM into VMEM
once, pivot selection (Dantzig/Bland pricing, masked ratio test with
basis-index tie-breaking) and the masked rank-1 pivot update all run on the
VPU against VMEM-resident data, and the updated block is written back once.
Per iteration the HBM traffic is exactly one read + one write of the
tableau tensor — the same bytes the rank-1 update alone needs.

Semantics mirror ``ops.batched._select_pivot_b`` + ``_pivot_update_b``
(reference behavior: the tableau pivot loop of ``simple_simplex`` at
``/root/reference/app/controllers/solver_controller.py:290-319``, batched):
instances that are optimal/unbounded/not-running pass through untouched and
are reported via the flag outputs; phase flips and refactorization stay in
the XLA driver loop (they are rare and need batched ``linalg.solve``).

Reductions use the min-with-iota trick (two plain min-reductions) instead
of ``argmin`` so everything lowers to Mosaic-supported reduce ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RUNNING = -1
_INT_MAX = jnp.iinfo(jnp.int32).max


def _first_where(mask, idx, axis=-1):
    """Lowest index where ``mask`` holds (INT_MAX if none) — min-reduction."""
    return jnp.min(jnp.where(mask, idx, _INT_MAX), axis=axis)


def _make_kernel(tol: float, devex: bool):
    # Mosaic cannot reshape i1 (bool) vectors, so every boolean mask below is
    # BORN at its final rank: reductions keep dims, rank-3 masks come from
    # rank-3 iota comparisons, and rank promotions route through int32.
    def kernel(T_ref, basis_ref, cm1_ref, cm2_ref, phase_ref,
               status_ref, bland_ref, w_ref, Tout_ref, basis_out_ref,
               w_out_ref, s_ref, r_ref, opt_ref, unb_ref, did_ref):
        T = T_ref[...]                              # (bB, M, N)
        basis = basis_ref[...]                      # (bB, M-1)
        bB, M, N = T.shape
        dtype = T.dtype
        eps = jnp.finfo(dtype).eps

        in_p1 = phase_ref[...] == 1                 # (bB, 1)
        live = status_ref[...] == RUNNING           # (bB, 1)
        use_bland = bland_ref[...] > 0              # (bB, 1) per instance

        # ---- Pricing: entering column s ------------------------------- #
        cm = jnp.where(in_p1, cm1_ref[...], cm2_ref[...])        # (bB, N)
        obj = T[:, M - 1, :]
        rc = jnp.where(cm > 0.5, obj, jnp.inf)
        eligible = rc < -tol
        idx_n = lax.broadcasted_iota(jnp.int32, (bB, N), 1)
        if devex:
            # Forrest-Goldfarb reference weights: argmax rc^2 / w.
            w = w_ref[...]                                       # (bB, N)
            score = jnp.where(eligible, (rc * rc) / w, -jnp.inf)
            sc_max = jnp.max(score, axis=-1, keepdims=True)
            s_price = _first_where(score == sc_max, idx_n)
        else:
            rc_min = jnp.min(rc, axis=-1, keepdims=True)
            s_price = _first_where(rc == rc_min, idx_n)          # (bB,) i32
        s_bland = _first_where(eligible, idx_n)
        s = jnp.where(use_bland, s_bland[:, None], s_price[:, None])[:, 0]
        s = jnp.clip(s, 0, N - 1)
        optimal = ~jnp.any(eligible, axis=-1, keepdims=True)     # (bB, 1)

        # ---- Ratio test: leaving row r -------------------------------- #
        hot_s = (idx_n == s[:, None]).astype(dtype)              # (bB, N)
        col = jnp.sum(T * hot_s[:, None, :], axis=-1)            # (bB, M)
        colc = col[:, : M - 1]
        rhs = T[:, : M - 1, N - 1]
        positive = colc > tol
        # Backward-step clamp — see ops/tableau.select_pivot.
        rhs_c = jnp.maximum(rhs, 0.0)
        ratios = jnp.where(positive,
                           rhs_c / jnp.where(positive, colc, 1.0),
                           jnp.inf)
        min_ratio = jnp.min(ratios, axis=-1, keepdims=True)      # (bB, 1)
        unbounded = (~optimal) & jnp.isinf(min_ratio)            # (bB, 1)
        # Harris two-pass (largest pivot in the tol-relaxed window) for
        # stability; Bland mode keeps the smallest-basis-index tie-break.
        delta = tol * (1.0 + jnp.abs(rhs))
        theta_relax = jnp.where(
            positive, (rhs_c + delta) / jnp.where(positive, colc, 1.0),
            jnp.inf)
        theta_max = jnp.min(theta_relax, axis=-1, keepdims=True)
        cand = positive & (ratios <= theta_max)
        piv_big = jnp.max(jnp.where(cand, colc, -jnp.inf), axis=-1,
                          keepdims=True)
        idx_m = lax.broadcasted_iota(jnp.int32, (bB, M - 1), 1)
        r_harris = _first_where(cand & (colc == piv_big), idx_m)
        near = ratios <= min_ratio + 64.0 * eps * (1.0 + jnp.abs(min_ratio))
        tie_key = jnp.where(near & positive, basis, _INT_MAX)
        tk_min = jnp.min(tie_key, axis=-1, keepdims=True)
        r_bland = _first_where(tie_key == tk_min, idx_m)         # (bB,) i32
        r = jnp.where(use_bland[:, 0], r_bland, r_harris)
        r = jnp.clip(r, 0, M - 2)

        # ---- Masked rank-1 pivot update ------------------------------- #
        active = live & ~optimal & ~unbounded                    # (bB, 1)
        hot_r = idx_m == r[:, None]                              # (bB, M-1)
        pivot = jnp.sum(jnp.where(hot_r, colc, 0.0), axis=-1,
                        keepdims=True)                           # (bB, 1)
        safe = jnp.where(active & (jnp.abs(pivot) > 0), pivot, 1.0)
        idx_m3 = lax.broadcasted_iota(jnp.int32, (bB, M, 1), 1)
        is_r3 = idx_m3 == r[:, None, None]                       # (bB, M, 1)
        idx_n3 = lax.broadcasted_iota(jnp.int32, (bB, 1, N), 2)
        is_s3 = idx_n3 == s[:, None, None]                       # (bB, 1, N)
        prow = jnp.sum(T * is_r3.astype(dtype), axis=1)          # (bB, N)
        prow_n = prow / safe                                     # (bB, N)
        # Execute the clamped step theta = max(rhs_r, 0)/pivot — see
        # ops/tableau.pivot_update (round-4 backward-step fix).
        last = idx_n == (N - 1)
        prow_n = jnp.where(last, jnp.maximum(prow_n, 0.0), prow_n)

        if devex:
            # Weight update from the normalized pivot row (alpha) — VMEM
            # resident, no extra HBM pass beyond the (bB, N) weight I/O.
            w_s = jnp.sum(jnp.where(idx_n == s[:, None], w, 0.0),
                          axis=-1, keepdims=True)                # (bB, 1)
            j_out = jnp.sum(jnp.where(hot_r, basis, 0), axis=-1,
                            keepdims=True)                       # (bB, 1)
            w_new = jnp.maximum(w, (prow_n * prow_n) * w_s)
            w_new = jnp.where(idx_n == j_out, jnp.maximum(w_s, 1.0), w_new)
            w_new = jnp.where(idx_n == s[:, None], 1.0, w_new)
            w_new = jnp.where(
                jnp.max(w_new, axis=-1, keepdims=True) > 1e8,
                jnp.ones_like(w_new), w_new)
            w_out_ref[...] = jnp.where(active, w_new, w)
        else:
            w_out_ref[...] = w_ref[...]

        T_new = T - col[:, :, None] * prow_n[:, None, :]
        T_new = jnp.where(is_r3, prow_n[:, None, :], T_new)
        T_new = jnp.where(is_s3, is_r3.astype(dtype), T_new)     # unit col

        act3 = active.astype(jnp.int32)[:, :, None] > 0          # (bB, 1, 1)
        Tout_ref[...] = jnp.where(act3, T_new, T)
        basis_out_ref[...] = jnp.where(
            active & hot_r, s[:, None].astype(basis.dtype), basis
        )
        s_ref[...] = s[:, None]
        r_ref[...] = r[:, None]
        opt_ref[...] = optimal.astype(jnp.int32)
        unb_ref[...] = unbounded.astype(jnp.int32)
        did_ref[...] = active.astype(jnp.int32)

    return kernel


def _make_kernel_bounded(tol: float, devex: bool, with_art: bool = True):
    """Fused bounded select+pivot step (semantic spec:
    ``ops.batched.solve_tableau_batch_bounded``'s loop body).

    Key identity that keeps the update Mosaic-simple: substituting the RHS
    lane of the normalized pivot row with ``sigma * theta`` makes the
    standard rank-1 elimination produce EXACTLY the bounded explicit
    updates — ``x_B -= sigma d theta`` on every row and
    ``z += sigma rc_s theta`` on the objective cell — so only the entering
    cell (``x_enter``) and the [0, ub_B] clip need masked fixes.
    Row-axis state (ub_B, is_art_row, basis) arrives padded to M rows so
    rank-3 masks can broadcast it without M-1 vs M reshapes.
    """
    def kernel(T_ref, basis_ref, atup_ref, cm1_ref, cm2_ref, phase_ref,
               status_ref, bland_ref, w_ref, ub_ref, ubB_ref, art_ref,
               artmask_ref,
               Tout_ref, basis_out_ref, atup_out_ref, w_out_ref,
               ubB_out_ref, art_out_ref, s_ref, r_ref, opt_ref, unb_ref,
               did_ref):
        T = T_ref[...]                              # (bB, M, Nc)
        basis = basis_ref[...]                      # (bB, M)
        bB, M, Nc = T.shape
        dtype = T.dtype
        eps = jnp.finfo(dtype).eps
        inf = jnp.asarray(jnp.inf, dtype)
        _ART = jnp.asarray(1e30, dtype)

        in_p1 = phase_ref[...] == 1                 # (bB, 1)
        live = status_ref[...] == RUNNING           # (bB, 1)
        use_bland = bland_ref[...] > 0              # (bB, 1)
        at_up = atup_ref[...] > 0                   # (bB, Nc)
        ub = ub_ref[...]                            # (bB, Nc)
        ub_B = ubB_ref[...]                         # (bB, M), +inf pad row
        is_art_row = art_ref[...] > 0               # (bB, M)
        art_mask = artmask_ref[...] > 0.5           # (bB, Nc)

        idx_n = lax.broadcasted_iota(jnp.int32, (bB, Nc), 1)
        idx_m = lax.broadcasted_iota(jnp.int32, (bB, M), 1)
        row_ok = idx_m < (M - 1)                    # constraint rows only

        # ---- Pricing: dual-infeasibility magnitude over BOTH bounds --- #
        cm = jnp.where(in_p1, cm1_ref[...], cm2_ref[...])       # (bB, Nc)
        obj = T[:, M - 1, :]
        valid = cm > 0.5
        rc = jnp.where(valid, obj, 0.0)
        elig_lo = valid & ~at_up & (rc < -tol)
        elig_up = valid & at_up & (rc > tol)
        eligible = elig_lo | elig_up
        viol = jnp.where(eligible, jnp.abs(rc), -inf)
        if devex:
            w = w_ref[...]
            score = jnp.where(eligible, (viol * viol) / w, -inf)
        else:
            score = viol
        sc_max = jnp.max(score, axis=-1, keepdims=True)
        s_price = _first_where(score == sc_max, idx_n)
        s_bland = _first_where(eligible, idx_n)
        s = jnp.where(use_bland[:, 0], s_bland, s_price)
        s = jnp.clip(s, 0, Nc - 2)
        optimal = ~jnp.any(eligible, axis=-1, keepdims=True)    # (bB, 1)

        s_hot = idx_n == s[:, None]                             # (bB, Nc)
        s_from_up = jnp.any(s_hot & at_up, axis=-1, keepdims=True)
        sigma = jnp.where(s_from_up, -1.0, 1.0).astype(dtype)   # (bB, 1)
        rc_s = jnp.sum(jnp.where(s_hot, obj, 0.0), axis=-1, keepdims=True)
        ub_s = jnp.sum(jnp.where(s_hot, ub, 0.0), axis=-1, keepdims=True)
        ub_s_safe = jnp.where(jnp.isfinite(ub_s), ub_s, 0.0)

        # ---- Bounded ratio test (full M rows, objective row masked) --- #
        hot_s_f = s_hot.astype(dtype)
        col = jnp.sum(T * hot_s_f[:, None, :], axis=-1)         # (bB, M)
        dd = sigma * col                                        # (bB, M)
        xB = T[:, :, Nc - 1]                                    # (bB, M)
        pos = row_ok & (dd > tol)
        neg = row_ok & (dd < -tol) & jnp.isfinite(ub_B)
        # Backward-step clamps on BOTH limits (see ops/tableau).
        xB_c = jnp.maximum(xB, 0.0)
        span_c = jnp.maximum(ub_B - xB, 0.0)
        t_lo = jnp.where(pos, xB_c / jnp.where(pos, dd, 1.0), inf)
        t_hi = jnp.where(neg, span_c / jnp.where(neg, -dd, 1.0), inf)
        if with_art:
            art_exit = (~in_p1) & is_art_row & (jnp.abs(dd) > tol) & row_ok
            t_lo = jnp.where(art_exit, 0.0, t_lo)
            cand = pos | neg | art_exit
        else:
            # phase2_only batches have no artificial columns at all —
            # the artificial-exit machinery is statically dead.
            cand = pos | neg
        t_row = jnp.minimum(t_lo, t_hi)
        min_row = jnp.min(t_row, axis=-1, keepdims=True)        # (bB, 1)
        theta = jnp.minimum(min_row, ub_s)
        unbounded = (~optimal) & jnp.isinf(theta)
        flip = (~optimal) & (~unbounded) & (ub_s <= min_row)
        theta_safe = jnp.where(jnp.isfinite(theta), theta, 0.0)

        # Harris two-pass over both limits; Bland keeps basis-index ties.
        delta_lo = tol * (1.0 + jnp.abs(xB))
        delta_hi = tol * (1.0 + jnp.abs(jnp.where(neg, ub_B - xB, 0.0)))
        t_lo_rel = jnp.where(pos, (xB_c + delta_lo) /
                             jnp.where(pos, dd, 1.0), inf)
        t_hi_rel = jnp.where(neg, (span_c + delta_hi) /
                             jnp.where(neg, -dd, 1.0), inf)
        theta_max = jnp.min(jnp.minimum(t_lo_rel, t_hi_rel), axis=-1,
                            keepdims=True)
        if with_art:
            harris_cand = (cand & (t_row <= theta_max)) | art_exit
            hval = jnp.where(harris_cand,
                             jnp.abs(dd) + jnp.where(art_exit, _ART, 0.0),
                             -inf)
        else:
            harris_cand = cand & (t_row <= theta_max)
            hval = jnp.where(harris_cand, jnp.abs(dd), -inf)
        h_max = jnp.max(hval, axis=-1, keepdims=True)
        r_harris = _first_where(hval == h_max, idx_m)
        near = cand & (t_row <= min_row
                       + 64.0 * eps * (1.0 + jnp.abs(min_row)))
        tie_key = jnp.where(near, basis, _INT_MAX)
        tk_min = jnp.min(tie_key, axis=-1, keepdims=True)
        r_bland = _first_where(tie_key == tk_min, idx_m)
        r = jnp.where(use_bland[:, 0], r_bland, r_harris)
        r = jnp.clip(r, 0, M - 2)
        hot_r = idx_m == r[:, None]                             # (bB, M)
        t_lo_r = jnp.sum(jnp.where(hot_r, t_lo, 0.0), axis=-1,
                         keepdims=True)
        t_hi_r = jnp.sum(jnp.where(hot_r, t_hi, 0.0), axis=-1,
                         keepdims=True)
        leave_up = t_hi_r < t_lo_r                              # (bB, 1)

        active = live & ~optimal & ~unbounded                   # (bB, 1)
        do_pivot = active & ~flip
        do_flip = active & flip

        j_out = jnp.sum(jnp.where(hot_r, basis, 0), axis=-1,
                        keepdims=True)                          # (bB, 1)
        if with_art:
            is_art_s = jnp.any(s_hot & art_mask, axis=-1, keepdims=True)

        # ---- PIVOT: standard rank-1; the RHS column is recomputed as a
        # rank-2 vector with the bounded explicit formulas (x_B -= σdθ,
        # entering at x_enter, clip to [0, ub_B]; the objective row obeys
        # the SAME x -= dθ formula since dd[obj] = σ rc_s) and merged with
        # ONE lane-masked select — 7 full-tensor passes, not 9.          #
        pivot = jnp.sum(jnp.where(hot_r, col, 0.0), axis=-1,
                        keepdims=True)                          # (bB, 1)
        safe = jnp.where(do_pivot & (jnp.abs(pivot) > 0), pivot, 1.0)
        idx_m3 = lax.broadcasted_iota(jnp.int32, (bB, M, 1), 1)
        is_r3 = idx_m3 == r[:, None, None]                      # (bB, M, 1)
        idx_n3 = lax.broadcasted_iota(jnp.int32, (bB, 1, Nc), 2)
        is_s3 = idx_n3 == s[:, None, None]                      # (bB, 1, Nc)
        last3 = idx_n3 == (Nc - 1)
        prow = jnp.sum(T * is_r3.astype(dtype), axis=1)         # (bB, Nc)
        prow_n = prow / safe

        if devex:
            w_s = jnp.sum(jnp.where(s_hot, w, 0.0), axis=-1,
                          keepdims=True)                        # (bB, 1)
            w_new = jnp.maximum(w, (prow_n * prow_n) * w_s)
            w_new = jnp.where(idx_n == j_out, jnp.maximum(w_s, 1.0), w_new)
            w_new = jnp.where(s_hot, 1.0, w_new)
            w_new = jnp.where(
                jnp.max(w_new, axis=-1, keepdims=True) > 1e8,
                jnp.ones_like(w_new), w_new)
            w_out_ref[...] = jnp.where(do_pivot, w_new, w)
        else:
            w_out_ref[...] = w_ref[...]

        T_new = T - col[:, :, None] * prow_n[:, None, :]
        T_new = jnp.where(is_r3, prow_n[:, None, :], T_new)
        T_new = jnp.where(is_s3, is_r3.astype(dtype), T_new)    # unit col

        # RHS column (rank-2): pivot step, bound flip, or pass-through.
        ub_B_new = jnp.where(hot_r, ub_s, ub_B)                 # (bB, M)
        x_enter = jnp.where(s_from_up, ub_s_safe - theta_safe, theta_safe)
        xB_piv = xB - dd * theta_safe
        xB_piv = jnp.where(hot_r, x_enter, xB_piv)
        xB_piv = jnp.where(row_ok, jnp.clip(xB_piv, 0.0, ub_B_new), xB_piv)
        xB_flip = xB - dd * ub_s_safe
        xB_flip = jnp.where(row_ok, jnp.clip(xB_flip, 0.0, ub_B), xB_flip)
        newlast = jnp.where(do_pivot, xB_piv,
                            jnp.where(do_flip, xB_flip, xB))    # (bB, M)

        dp3 = do_pivot.astype(jnp.int32)[:, :, None] > 0        # (bB, 1, 1)
        T_out = jnp.where(dp3, T_new, T)
        T_out = jnp.where(last3, newlast[:, :, None], T_out)
        Tout_ref[...] = T_out

        basis_out_ref[...] = jnp.where(
            do_pivot & hot_r, s[:, None].astype(basis.dtype), basis)
        # at-upper bookkeeping: leaving variable exits at its bound;
        # entering/flipping column toggles.  Selects run on int32 operands
        # — Mosaic cannot truncate broadcast i8 vectors to i1.
        jout_hot = idx_n == j_out
        atup_i = atup_ref[...]                                  # int32
        leave_i = leave_up.astype(jnp.int32)                    # (bB, 1)
        atup_piv = jnp.where(jout_hot, leave_i, atup_i)
        atup_piv = jnp.where(s_hot, 0, atup_piv)
        atup_flip = jnp.where(s_hot, 1 - atup_i, atup_i)
        atup_out_ref[...] = jnp.where(
            do_pivot, atup_piv, jnp.where(do_flip, atup_flip, atup_i))
        ubB_out_ref[...] = jnp.where(do_pivot & hot_r, ub_s, ub_B)
        if with_art:
            art_out_ref[...] = jnp.where(
                do_pivot & hot_r, is_art_s.astype(jnp.int32), art_ref[...])
        else:
            art_out_ref[...] = art_ref[...]

        s_ref[...] = s[:, None]
        r_ref[...] = r[:, None]
        opt_ref[...] = optimal.astype(jnp.int32)
        unb_ref[...] = unbounded.astype(jnp.int32)
        did_ref[...] = active.astype(jnp.int32)      # moving: pivot OR flip

    return kernel


_VMEM_LIMIT = 96 << 20   # raised Mosaic scoped-VMEM cap (v5e VMEM = 128 MB)


def _pick_block_b(B: int, M: int, N: int,
                  vmem_budget: int = _VMEM_LIMIT // 5) -> int:
    """Largest power-of-two instance block that fits the scoped-VMEM cap:
    in+out tableau blocks plus mask, weight (in+out), basis (in+out), and
    flag blocks.  Mosaic multi-buffers the pipeline at ~4x the block
    footprint (measured: a 4.4 MB footprint allocates 17.6 MB on-stack),
    so the budget is 1/5 of the limit we request via
    ``CompilerParams(vmem_limit_bytes=...)``."""
    per_instance = (2 * M * N + 6 * N + 2 * (M - 1) + 12) * 4
    blk = 1
    while blk * 2 <= B and B % (blk * 2) == 0 and \
            (blk * 2) * per_instance <= vmem_budget and blk * 2 <= 512:
        blk *= 2
    return blk


@functools.partial(jax.jit, static_argnames=("tol", "devex", "interpret",
                                             "block_b"))
def fused_pivot_step(T, basis, cm1, cm2, phase, status, use_bland, weights,
                     tol: float = 1e-6, devex: bool = False,
                     interpret: bool = False, block_b: int = 0):
    """One fused select+pivot step for every instance in the batch.

    Args:
      T:         (B, M, N) tableaus (objective row last, RHS column last).
      basis:     (B, M-1) int32.
      cm1, cm2:  (B, N) float phase-1/phase-2 eligible-column masks
                 (1.0 eligible, 0.0 masked; the RHS lane must be 0).
      phase:     (B,) int32 — 1 or 2.
      status:    (B,) int32 — RUNNING (-1) keeps an instance live.
      use_bland: (B,) int32 — nonzero switches that instance's pricing to
                 Bland's rule (stall-gated anti-cycling; scalars broadcast).
      weights:   (B, N-1) per-instance Devex reference weights (threaded
                 through the kernel like the Bland flags; ignored unless
                 ``devex``).

    Returns ``(T_new, basis_new, weights_new, s, r, optimal, unbounded,
    did_pivot)``; the flag vectors have shape (B,).
    """
    B, M, N = T.shape
    assert basis.shape == (B, M - 1), (basis.shape, T.shape)
    bb = block_b or _pick_block_b(B, M, N)
    grid = (B // bb,)

    def bspec(*dims):
        return pl.BlockSpec((bb,) + dims, lambda i: (i,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            bspec(M, N),          # T
            bspec(M - 1),         # basis
            bspec(N),             # cm1
            bspec(N),             # cm2
            bspec(1),             # phase
            bspec(1),             # status
            bspec(1),             # bland flags
            bspec(N),             # devex weights (RHS lane padded)
        ],
        out_specs=[
            bspec(M, N),          # T_out
            bspec(M - 1),         # basis_out
            bspec(N),             # weights_out
            bspec(1), bspec(1), bspec(1), bspec(1), bspec(1),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, M, N), T.dtype),
        jax.ShapeDtypeStruct((B, M - 1), basis.dtype),
        jax.ShapeDtypeStruct((B, N), T.dtype),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]
    bland_arr = jnp.broadcast_to(
        jnp.asarray(use_bland, jnp.int32).reshape(-1, 1), (B, 1))
    # Pad the weight vector's RHS lane so the lane axis stays tile-aligned
    # with the tableau's column axis.
    w_in = jnp.concatenate(
        [jnp.asarray(weights, T.dtype), jnp.ones((B, 1), T.dtype)], axis=1)
    T2, basis2, w2, s, r, opt, unb, did = pl.pallas_call(
        _make_kernel(tol, devex),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(T, basis,
      jnp.asarray(cm1, T.dtype), jnp.asarray(cm2, T.dtype),
      phase.reshape(B, 1), status.reshape(B, 1), bland_arr, w_in)
    return (T2, basis2, w2[:, :-1], s[:, 0], r[:, 0], opt[:, 0] > 0,
            unb[:, 0] > 0, did[:, 0] > 0)


def _pick_block_b_bounded(B: int, M: int, N: int,
                          vmem_budget: int = _VMEM_LIMIT // 8) -> int:
    """Bounded-kernel block picker: the footprint adds the bound state
    (ub, at_upper in/out, ub_B in/out, is_art_row in/out, art_mask) to the
    classic kernel's tableau + mask + weight traffic.  The budget is
    tighter than the classic kernel's: at 1/5 the 30x50-shape block lands
    on 512 and the multibuffered footprint crowds VMEM — measured 1.9x
    the per-step cost of the same kernel at 256 (r5)."""
    per_instance = (2 * M * N + 9 * N + 8 * M + 16) * 4
    blk = 1
    while blk * 2 <= B and B % (blk * 2) == 0 and \
            (blk * 2) * per_instance <= vmem_budget and blk * 2 <= 512:
        blk *= 2
    return blk


@functools.partial(jax.jit, static_argnames=("tol", "devex", "interpret",
                                             "block_b", "with_art"))
def fused_pivot_step_bounded(T, basis, at_upper, cm1, cm2, phase, status,
                             use_bland, weights, ub, ub_B, is_art_row,
                             art_mask,
                             tol: float = 1e-6, devex: bool = False,
                             interpret: bool = False, block_b: int = 0,
                             with_art: bool = True):
    """One fused BOUNDED select+pivot step for every instance in the batch.

    Fuses the loop body of ``ops.batched.solve_tableau_batch_bounded``
    (two-sided pricing, bounded ratio test with bound flips, explicit
    RHS/objective maintenance, at-upper bookkeeping) into one
    ``pallas_call`` — one HBM read + write of the tableau per iteration,
    same as the classic kernel, removing the bounded path's ~26% XLA-step
    tax (VERDICT r4 missing #3).  Phase flips and refactorization stay in
    the XLA driver loop.

    Args (beyond :func:`fused_pivot_step`):
      at_upper:   (B, N-1) bool — nonbasic columns sitting at their upper
                  bound (N = tableau width incl. the RHS lane).
      ub:         (B, N-1) upper bounds (+inf where unbounded).
      ub_B:       (B, M-1) carried per-row basic upper bounds.
      is_art_row: (B, M-1) bool carried artificial-row flags.
      art_mask:   (B, N) float artificial-column mask (RHS lane 0).

    Returns ``(T, basis, at_upper, weights, ub_B, is_art_row, s, r,
    optimal, unbounded, moving)``; ``moving`` covers pivots AND flips.
    """
    B, M, N = T.shape
    assert basis.shape == (B, M - 1), (basis.shape, T.shape)
    bb = block_b or _pick_block_b_bounded(B, M, N)
    grid = (B // bb,)

    def bspec(*dims):
        return pl.BlockSpec((bb,) + dims, lambda i: (i,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            bspec(M, N),          # T
            bspec(M),             # basis (padded row)
            bspec(N),             # at_upper (int32, RHS lane padded)
            bspec(N),             # cm1
            bspec(N),             # cm2
            bspec(1),             # phase
            bspec(1),             # status
            bspec(1),             # bland flags
            bspec(N),             # devex weights (RHS lane padded)
            bspec(N),             # ub (RHS lane padded)
            bspec(M),             # ub_B (padded row = +inf)
            bspec(M),             # is_art_row (int32, padded row = 0)
            bspec(N),             # art_mask
        ],
        out_specs=[
            bspec(M, N),          # T_out
            bspec(M),             # basis_out
            bspec(N),             # at_upper_out
            bspec(N),             # weights_out
            bspec(M),             # ub_B_out
            bspec(M),             # is_art_row_out
            bspec(1), bspec(1), bspec(1), bspec(1), bspec(1),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, M, N), T.dtype),
        jax.ShapeDtypeStruct((B, M), basis.dtype),
        jax.ShapeDtypeStruct((B, N), jnp.int32),
        jax.ShapeDtypeStruct((B, N), T.dtype),
        jax.ShapeDtypeStruct((B, M), T.dtype),
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]
    dtype = T.dtype
    bland_arr = jnp.broadcast_to(
        jnp.asarray(use_bland, jnp.int32).reshape(-1, 1), (B, 1))
    one = jnp.ones((B, 1), dtype)
    w_in = jnp.concatenate([jnp.asarray(weights, dtype), one], axis=1)
    ub_in = jnp.concatenate(
        [jnp.asarray(ub, dtype), jnp.full((B, 1), jnp.inf, dtype)], axis=1)
    atup_in = jnp.concatenate(
        [jnp.asarray(at_upper, jnp.int32), jnp.zeros((B, 1), jnp.int32)],
        axis=1)
    # Row-axis state padded to M so rank-3 masks broadcast without M-1 vs
    # M reshapes inside the kernel (the pad row is never selectable: r is
    # clipped to M-2 and the ratio test masks the objective row out).
    basis_in = jnp.concatenate(
        [basis, jnp.full((B, 1), _INT_MAX, basis.dtype)], axis=1)
    ubB_in = jnp.concatenate(
        [jnp.asarray(ub_B, dtype), jnp.full((B, 1), jnp.inf, dtype)],
        axis=1)
    art_in = jnp.concatenate(
        [jnp.asarray(is_art_row, jnp.int32), jnp.zeros((B, 1), jnp.int32)],
        axis=1)
    (T2, basis2, atup2, w2, ubB2, art2, s, r, opt, unb, did) = pl.pallas_call(
        _make_kernel_bounded(tol, devex, with_art),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(T, basis_in, atup_in,
      jnp.asarray(cm1, dtype), jnp.asarray(cm2, dtype),
      phase.reshape(B, 1), status.reshape(B, 1), bland_arr, w_in, ub_in,
      ubB_in, art_in, jnp.asarray(art_mask, dtype))
    return (T2, basis2[:, :-1], atup2[:, :-1] > 0, w2[:, :-1],
            ubB2[:, :-1], art2[:, :-1] > 0, s[:, 0], r[:, 0],
            opt[:, 0] > 0, unb[:, 0] > 0, did[:, 0] > 0)

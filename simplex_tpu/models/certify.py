"""Vectorized f64 certification of batched simplex verdicts.

The single-LP paths KKT-check every claimed optimum in host float64 and
re-solve failures exactly (``models/dense.py`` ``_finalize_on_host`` /
``_host_simplex_f64``) — the safety net that makes the f32 device loop
trustworthy.  Sweeps are exactly where one silent f32 mis-verdict hides
among 10k right answers, so batched (``models/batched.py``) and sharded
(``parallel/sharded.py``) verdicts get the same treatment here, vectorized:

* **Certification** is one batched LU over the (B, m, m) basis matrices
  (``np.linalg.solve`` broadcasts) + one reduced-cost matvec — numpy-cheap
  at sweep shapes (m ≤ a few hundred).  The KKT conditions checked are
  identical to the single-LP ``_finalize_on_host``: primal feasibility of
  ``B x_B = b`` in f64, no artificial basic above tolerance, and dual
  feasibility ``rc >= -tol`` over the phase-2 columns.
* **Escalation** re-solves every failed-certification optimum and every
  claimed infeasible/unbounded/iteration-limit instance through
  :func:`models.dense.solve_lp_host_exact` — the same exact host engine
  single-LP escalation uses — so a batch element can never carry a verdict
  a single solve of the same LP would have rejected.

The reference gets this guarantee for free by trusting HiGHS f64
(``/root/reference/app/controllers/solver_controller.py:78-85``); an f32
TPU sweep has to earn it.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..core.problem import (
    STATUS_INFEASIBLE,
    STATUS_ITERATION_LIMIT,
    STATUS_OPTIMAL,
    STATUS_UNBOUNDED,
    LinearProgram,
)


def certify_bases_f64(A_std: np.ndarray, b_std: np.ndarray,
                      c_std: np.ndarray, art_mask: np.ndarray,
                      valid_mask: np.ndarray, basis: np.ndarray,
                      check: Optional[np.ndarray] = None,
                      tol: float = 1e-7):
    """Batched f64 KKT check of claimed-optimal bases.

    Args (all numpy, f64 where float):
      A_std:      (B, m, N) standard-form constraint columns
      b_std:      (B, m) canonicalized RHS
      c_std:      (B, N) raw min-form phase-2 costs
      art_mask:   (B, N) bool — artificial columns
      valid_mask: (B, N) bool — phase-2-eligible columns
      basis:      (B, m) int — claimed basis column per row
      check:      (B,) bool — instances to certify (others return False)

    Returns ``(certified (B,) bool, x_full (B, N) f64 vertex, fun (B,) f64
    min-form objective)``; x_full/fun are meaningful only where certified.
    """
    A_std = np.asarray(A_std, np.float64)
    b_std = np.asarray(b_std, np.float64)
    c_std = np.asarray(c_std, np.float64)
    basis = np.asarray(basis, np.int64)
    B_, m, N = A_std.shape
    if check is None:
        check = np.ones((B_,), bool)

    in_range = ~np.any((basis < 0) | (basis >= N), axis=1)
    safe_basis = np.where(in_range[:, None], basis, 0)

    Bmat = np.take_along_axis(A_std, safe_basis[:, None, :], axis=2)
    cB = np.take_along_axis(c_std, safe_basis, axis=1)
    ok_solve = np.zeros((B_,), bool)
    xB = np.zeros((B_, m))
    y = np.zeros((B_, m))
    sel = check & in_range
    if np.any(sel):
        idx = np.nonzero(sel)[0]
        if m >= 512:
            # Large-m regime (sharded row-block solves): ONE LU per
            # instance serves both triangular solves — numpy's batched
            # ``solve`` would factorize B twice (for B and Bᵀ), and at
            # m=16k each factorization is ~45 s of host LAPACK.
            from scipy.linalg import lu_factor, lu_solve

            for i in idx:
                try:
                    lu = lu_factor(Bmat[i])
                    xB[i] = lu_solve(lu, b_std[i])
                    y[i] = lu_solve(lu, cB[i], trans=1)
                    ok_solve[i] = True
                except (np.linalg.LinAlgError, ValueError):
                    pass
        else:
            try:
                xB[idx] = np.linalg.solve(
                    Bmat[idx], b_std[idx][..., None])[..., 0]
                y[idx] = np.linalg.solve(np.swapaxes(Bmat[idx], 1, 2),
                                         cB[idx][..., None])[..., 0]
                ok_solve[idx] = True
            except np.linalg.LinAlgError:
                # Some instance's basis matrix is singular: numpy's batched
                # solve rejects the whole stack, so fall back per instance.
                for i in idx:
                    try:
                        xB[i] = np.linalg.solve(Bmat[i], b_std[i])
                        y[i] = np.linalg.solve(Bmat[i].T, cB[i])
                        ok_solve[i] = True
                    except np.linalg.LinAlgError:
                        pass
        finite = np.all(np.isfinite(xB), axis=1) & \
            np.all(np.isfinite(y), axis=1)
        ok_solve &= finite

    rc = c_std - np.einsum("bm,bmn->bn", y, A_std)
    scale = 1.0 + np.max(np.abs(b_std), axis=1, initial=0.0)
    c_scale = 1.0 + np.max(np.abs(c_std), axis=1, initial=0.0)
    prim_ok = ~np.any(xB < -tol * scale[:, None], axis=1)
    art_basic = np.take_along_axis(art_mask, safe_basis, axis=1)
    art_ok = ~np.any(art_basic & (np.abs(xB) > tol * scale[:, None]), axis=1)
    dual_ok = np.all((~valid_mask) | (rc >= -tol * c_scale[:, None]), axis=1)
    certified = check & in_range & ok_solve & prim_ok & art_ok & dual_ok

    x_full = np.zeros((B_, N))
    np.put_along_axis(x_full, safe_basis, xB, axis=1)
    fun = np.einsum("bn,bn->b", c_std, x_full)
    return certified, x_full, fun


def certify_infeasible_f64(A_std: np.ndarray, b_std: np.ndarray,
                           c1_std: np.ndarray, mask_p1: np.ndarray,
                           basis: np.ndarray,
                           check: Optional[np.ndarray] = None,
                           tol: float = 1e-7) -> np.ndarray:
    """Batched f64 certificate of claimed-INFEASIBLE verdicts.

    An f32 'infeasible' claim means the device's phase 1 terminated with
    artificials still carrying weight.  That claim is exact iff the final
    basis is a true phase-1 optimum in f64 with positive objective: primal
    feasible (``B x_B = b``, ``x_B >= -tol``), dual feasible over phase-1
    columns for the phase-1 costs, and ``c1' x > tol`` — the optimal value
    of min sum-of-artificials being positive IS the infeasibility proof
    (the KKT form of a Farkas certificate).  Verdicts certified here skip
    the per-instance host re-solve entirely, so a sweep full of genuinely
    infeasible instances stays vectorized.
    """
    certified, x_full, fun1 = certify_bases_f64(
        A_std, b_std, c1_std, np.zeros_like(mask_p1), mask_p1, basis,
        check=check, tol=tol)
    scale = 1.0 + np.max(np.abs(b_std), axis=1, initial=0.0)
    return certified & (fun1 > tol * scale)


def certify_and_escalate(status: np.ndarray, basis: np.ndarray,
                         A_std: np.ndarray, b_std: np.ndarray,
                         c_std: np.ndarray, art_mask: np.ndarray,
                         valid_mask: np.ndarray,
                         make_lp: Callable[[int], LinearProgram],
                         maximize: np.ndarray, n_vars: int,
                         tol: float = 1e-7,
                         c1_std: Optional[np.ndarray] = None,
                         mask_p1: Optional[np.ndarray] = None):
    """Certify a batch's verdicts and exactly re-solve the untrusted ones.

    ``make_lp(i)`` must build the i-th instance's :class:`LinearProgram` in
    the SAME space the batch was solved in (bounds already lowered, free
    variables already split), so escalated solutions line up column-for-
    column with the batch arrays.

    ``c1_std``/``mask_p1`` (raw phase-1 costs + phase-1 column mask): when
    given, claimed-infeasible instances are first checked against the
    vectorized Farkas certificate (:func:`certify_infeasible_f64`); only
    the ones it cannot certify fall through to the host re-solve.

    Returns a dict of per-instance corrections:
      ``certified`` (B,) bool — every True verdict passed an f64 KKT check
        (directly or via exact host re-solve);
      ``escalated`` (B,) bool — instances re-solved by the host engine;
      ``status``/``x``/``fun`` — corrected arrays (x is (B, n_vars), NaN
        where not optimal).
    """
    from .dense import solve_lp_host_exact

    status = np.asarray(status).copy()
    B_ = status.shape[0]
    maximize = np.broadcast_to(np.asarray(maximize, bool), (B_,))

    claimed_opt = status == STATUS_OPTIMAL
    certified, x_full, fun = certify_bases_f64(
        A_std, b_std, c_std, art_mask, valid_mask, basis,
        check=claimed_opt, tol=tol)

    claimed_inf = status == STATUS_INFEASIBLE
    inf_certified = np.zeros((B_,), bool)
    if c1_std is not None and mask_p1 is not None and np.any(claimed_inf):
        inf_certified = certify_infeasible_f64(
            A_std, b_std, c1_std, mask_p1, basis, check=claimed_inf,
            tol=tol)

    # Untrusted: optimal-but-uncertified, plus every terminal non-optimal
    # claim the certificates above couldn't prove (an f32 'infeasible' can
    # be drift; 'unbounded' can be a fake eligible column; iteration-limit
    # may be a numeric stall).
    escalate = (claimed_opt & ~certified) | (claimed_inf & ~inf_certified) \
        | np.isin(status, (STATUS_UNBOUNDED, STATUS_ITERATION_LIMIT))

    x = np.full((B_, n_vars), np.nan)
    fun_out = np.full((B_,), np.nan)
    ok = certified | inf_certified
    if np.any(certified):
        ci = np.nonzero(certified)[0]
        x[ci] = np.maximum(x_full[ci, :n_vars], 0.0)
        fun_out[ci] = fun[ci]

    for i in np.nonzero(escalate)[0]:
        res = solve_lp_host_exact(make_lp(int(i)))
        status[i] = res.status
        if res.success:
            xi = np.asarray(res.x, np.float64)
            x[i, : xi.shape[0]] = xi[:n_vars]
            fun_out[i] = res.fun
            ok[i] = True
        else:
            ok[i] = res.status in (STATUS_INFEASIBLE, STATUS_UNBOUNDED)

    return {
        "certified": ok,
        "escalated": escalate,
        "status": status,
        "x": x,
        "fun": fun_out,
        "z": np.where(maximize, -fun_out, fun_out) + 0.0,
    }

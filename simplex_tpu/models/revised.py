"""Revised simplex with explicit basis-inverse maintenance (single chip).

BASELINE config 4 ("netlib-style LPs via revised simplex with
basis-factorization updates").  Where the dense tableau engine rewrites the
whole (m x n) tableau every pivot (HBM-bound), the revised method keeps only
the m x m basis inverse and the original column data:

  pricing:    pi = c_B  B_inv        (m^2 MXU work)
              rc = c - pi A          (m*n matvec — the only O(mn) op,
                                      a clean MXU contraction over A)
  FTRAN:      d  = B_inv a_s         (m^2)
  update:     eta rank-1 on B_inv    (m^2), periodic exact refactorization
              via jnp.linalg.solve   (m^3, amortized)

so for n >> m (netlib-shaped: many columns, fewer rows) per-pivot cost drops
from O(mn) HBM traffic to O(m^2) + one matvec.  Phase handling matches
``ops/tableau.py``; basic artificials are driven out in phase 2 by the
ratio-test preference used in the sharded kernel (``parallel/sharded.py``).

Why explicit inverse + periodic dense refactor, NOT an LU/eta file
(deliberate TPU design, not an omission): CPU production codes keep a
sparse LU of B and append eta vectors because their FTRAN/BTRAN are
cache-friendly sparse triangular solves.  On TPU, triangular solves are
SEQUENTIAL along the diagonal (no MXU utilization, one lane busy), while
the explicit-inverse update is a rank-1 dense operation and every
FTRAN/BTRAN/PRICE is a dense matvec — exactly what the MXU streams at
full rate.  The LU lives WHERE it belongs: inside the periodic
``jnp.linalg.solve`` refactorization (device LAPACK, O(m^3) amortized
over ``refactor_every`` pivots), which also bounds the inverse-drift the
eta-style rank-1 updates accumulate.  Sparsity in A is likewise not
exploited at the instruction level: netlib-scale dense matvecs are
bandwidth-trivial for the MXU, and irregular gather/scatter sparsity
fights the (8, 128) tiling (SURVEY.md §7 "hard parts").

Numerics: float32 on device with f64 host verdict certification +
refinement of the final basis (same policy as models/dense), plus a
one-shot loose-tol retry on numeric stalls.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import SolverConfig, DEFAULT_CONFIG, resolve_dtype
from ..core.problem import (
    LinearProgram,
    STATUS_INFEASIBLE,
    STATUS_ITERATION_LIMIT,
    STATUS_MESSAGES,
    STATUS_OPTIMAL,
    STATUS_UNBOUNDED,
    compile_standard_form,
    merge_free_solution,
    split_free_variables,
)
from .dense import (
    SimplexResult,
    _finalize_on_host,
    _host_simplex_f64,
)

RUNNING = -1
_INT_MAX = jnp.iinfo(jnp.int32).max
_ART_BONUS = 1 << 20


def _refactor(A_std, b, basis):
    """Exact B_inv and x_B from the original data (batched dense solves)."""
    B = jnp.take(A_std, basis, axis=1)
    eye = jnp.eye(B.shape[0], dtype=A_std.dtype)
    B_inv = jnp.linalg.solve(B, eye)
    x_B = B_inv @ b
    return B_inv, x_B


@functools.partial(
    jax.jit,
    static_argnames=("tol", "max_iters", "bland_after", "refactor_every",
                     "devex"),
)
def _run_phase_revised(A_std, b, cost, col_mask, art_mask_ext,
                       B_inv, x_B, basis, iters0, in_phase2,
                       tol: float = 1e-6, max_iters: int = 8192,
                       bland_after: int = 2048, refactor_every: int = 64,
                       devex: bool = False):
    """One phase of revised simplex.  Returns (B_inv, x_B, basis, iters,
    status, objective).

    ``devex``: Forrest-Goldfarb reference-weight pricing.  The weight
    update needs the transformed pivot row ``alpha = B_inv[r] @ A_std`` —
    one extra O(mn) MXU matvec per pivot (BTRAN+PRICE in production
    terms), typically repaid severalfold in saved iterations.
    """

    # f32 numeric-stall cutoff (see ops/tableau.py): exit after a full
    # Bland budget of consecutive non-improving pivots; the driver then
    # escalates to the host f64 engine instead of burning the whole cap.
    stall_limit = bland_after + 1024

    def cond(state):
        _B, _x, _bas, iters, status, _since, _w, _bo, no_imp = state
        return ((status == RUNNING) & (iters < max_iters)
                & (no_imp < stall_limit))

    def body(state):
        B_inv, x_B, basis, iters, status, since, w, best_obj, no_imp = state

        do_ref = since >= refactor_every
        B_inv, x_B = lax.cond(
            do_ref, lambda _: _refactor(A_std, b, basis),
            lambda _: (B_inv, x_B), None)

        # Pricing.
        c_B = cost[basis]
        pi = c_B @ B_inv                                   # (m,)
        rc = cost[:-1] - pi @ A_std                        # (n,)
        rc = jnp.where(col_mask, rc, jnp.inf)
        eligible = rc < -tol
        # Stall-gated Bland: engage only after ``bland_after`` consecutive
        # non-improving pivots, revert when the objective moves (cycles are
        # improvement-free, so termination is preserved; cf. ops/tableau.py).
        use_bland = no_imp >= bland_after
        if devex:
            score = jnp.where(eligible, (rc * rc) / w, -jnp.inf)
            s_price = jnp.argmax(score)
        else:
            s_price = jnp.argmin(rc)
        s = jnp.where(use_bland, jnp.argmax(eligible), s_price)
        optimal = ~jnp.any(eligible)

        # FTRAN + ratio test.
        d = B_inv @ A_std[:, s]                            # (m,)
        is_art_row = art_mask_ext[basis]
        positive = d > tol
        art_exit = in_phase2 & is_art_row & (jnp.abs(d) > tol)
        ratios = jnp.where(positive, x_B / jnp.where(positive, d, 1.0),
                           jnp.inf)
        ratios = jnp.where(art_exit, 0.0, ratios)
        cand = positive | art_exit
        min_ratio = jnp.min(ratios)
        unbounded = (~optimal) & jnp.isinf(min_ratio)

        eps = jnp.finfo(x_B.dtype).eps
        near = cand & (ratios <= min_ratio
                       + 64.0 * eps * (1.0 + jnp.abs(min_ratio)))
        key = jnp.where(near,
                        basis - jnp.where(is_art_row, _ART_BONUS, 0),
                        _INT_MAX)
        r = jnp.argmin(key)
        theta = ratios[r]

        stop = optimal | unbounded
        new_status = jnp.where(
            stop, jnp.where(optimal, STATUS_OPTIMAL, STATUS_UNBOUNDED),
            RUNNING).astype(jnp.int32)

        def do_pivot(args):
            B_inv, x_B, basis, w = args
            dr = d[r]
            if devex:
                alpha = (B_inv[r] @ A_std) / dr            # pivot row
                w_s = w[s]
                w_new = jnp.maximum(w, (alpha * alpha) * w_s)
                w_new = w_new.at[basis[r]].set(jnp.maximum(w_s, 1.0))
                w_new = w_new.at[s].set(1.0)
                w = jnp.where(jnp.max(w_new) > 1e8,
                              jnp.ones_like(w_new), w_new)
            er = B_inv[r] / dr
            B_inv2 = B_inv - d[:, None] * er[None, :]
            B_inv2 = B_inv2.at[r].set(er)
            x_B2 = x_B - theta * d
            x_B2 = x_B2.at[r].set(theta)
            basis2 = basis.at[r].set(s.astype(basis.dtype))
            return B_inv2, jnp.maximum(x_B2, 0.0), basis2, w

        B_inv, x_B, basis, w = lax.cond(
            stop, lambda a: a, do_pivot, (B_inv, x_B, basis, w))
        obj = cost[basis] @ x_B
        improved = obj < best_obj - tol * (1.0 + jnp.abs(best_obj))
        best_obj = jnp.minimum(best_obj, obj)
        no_imp = jnp.where(improved, 0,
                           no_imp + (~stop).astype(no_imp.dtype))
        iters = iters + (~stop).astype(iters.dtype)
        since = jnp.where(do_ref, jnp.int32(1), since + 1)
        return (B_inv, x_B, basis, iters, new_status, since, w, best_obj,
                no_imp)

    w0 = jnp.ones((A_std.shape[1],), A_std.dtype)
    state = (B_inv, x_B, basis, iters0, jnp.int32(RUNNING), jnp.int32(1), w0,
             jnp.asarray(jnp.inf, x_B.dtype), jnp.int32(0))
    B_inv, x_B, basis, iters, status, _, _, _, _ = lax.while_loop(
        cond, body, state)
    status = jnp.where(status == RUNNING, STATUS_ITERATION_LIMIT, status)
    obj = cost[basis] @ x_B
    return B_inv, x_B, basis, iters, status, obj


class RevisedSimplexSolver:
    """Single-LP revised simplex (basis-inverse maintenance)."""

    def __init__(self, config: SolverConfig = DEFAULT_CONFIG):
        self.config = config

    def solve(self, lp: LinearProgram,
              warm_basis: Optional[np.ndarray] = None,
              _tol_scale: float = 1.0) -> SimplexResult:
        """Solve one LP.  ``warm_basis`` (column indices from a previous
        ``SimplexResult.basis``) skips phase 1 entirely when the saved
        basis is still primal-feasible for this data — the same
        checkpoint/resume capability the dense engine has (stale or
        infeasible bases fall back to a cold start transparently)."""
        t0 = time.perf_counter()
        if lp.has_free:
            lp2, fidx = split_free_variables(lp)
            res = self.solve(lp2, warm_basis, _tol_scale)
            if res.x is not None:
                res.x = merge_free_solution(res.x, lp.n_vars, fidx)
            if res.reduced_costs is not None:
                res.reduced_costs = res.reduced_costs[: lp.n_vars]
            return res
        if lp.n_cons == 0:
            from .dense import solve_lp
            return solve_lp(lp, self.config)

        dtype = resolve_dtype(self.config.dtype)
        sf = compile_standard_form(lp, dtype=np.float64)
        m_pad, n_pad = sf.m_pad, sf.n_pad

        A_std = jnp.asarray(sf.tableau[:m_pad, :n_pad], dtype)
        b = jnp.asarray(sf.tableau[:m_pad, n_pad], dtype)
        basis = jnp.asarray(sf.basis)
        col_p1 = jnp.asarray(sf.col_mask_p1)
        col_p2 = jnp.asarray(sf.col_mask_p2)
        art_ext = jnp.asarray(
            np.concatenate([sf.col_mask_p1 & ~sf.col_mask_p2,
                            np.ones((m_pad,), bool)])[:n_pad])
        cost1 = jnp.asarray(sf.obj_row_p1[:n_pad + 1], dtype)
        cost2 = jnp.asarray(sf.obj_row_p2[:n_pad + 1], dtype)

        tol = max(self.config.tol, 1e-6 if dtype == np.float32 else 1e-9)
        tol *= _tol_scale
        max_iters = min(self.config.max_iters, 50 * (m_pad + n_pad))
        bland_after = min(self.config.bland_after, max_iters // 2)

        need_phase1 = sf.need_phase1
        if warm_basis is not None:
            wb = self._check_warm_basis(sf, warm_basis)
            if wb is not None:
                basis = jnp.asarray(wb)
                need_phase1 = False

        B_inv, x_B = _refactor(A_std, b, basis)
        iters = jnp.int32(0)

        if need_phase1:
            B_inv, x_B, basis, iters, status, obj1 = _run_phase_revised(
                A_std, b, cost1, col_p1, art_ext, B_inv, x_B, basis, iters,
                jnp.bool_(False), tol=tol, max_iters=max_iters,
                bland_after=bland_after,
                devex=self.config.pivot_rule == "devex")
            b_scale = 1.0 + float(np.max(np.abs(sf.tableau[:m_pad, n_pad])))
            if int(status) != STATUS_OPTIMAL:
                return self._finish_failed(int(status), int(iters), lp, sf,
                                           t0)
            if float(obj1) > 1e-5 * b_scale:
                return self._finish_failed(STATUS_INFEASIBLE, int(iters),
                                           lp, sf, t0)

        B_inv, x_B, basis, iters, status, obj = _run_phase_revised(
            A_std, b, cost2, col_p2, art_ext, B_inv, x_B, basis, iters,
            jnp.bool_(True), tol=tol, max_iters=max_iters,
            bland_after=bland_after,
            devex=self.config.pivot_rule == "devex")
        status = int(status)
        nit = int(iters)
        basis_np = np.asarray(basis)

        # f64 verdict certification + escalation — the same safety net the
        # dense engine has (exactly-dependent columns can defeat any f32
        # loop; see models/dense._certify_optimal_basis).
        escalated = False
        fin = (False, None, None, None)
        if status == STATUS_OPTIMAL:
            fin = _finalize_on_host(sf, lp, basis_np, sf64=sf)
            escalated = not fin[0]
        elif status in (STATUS_INFEASIBLE, STATUS_UNBOUNDED):
            escalated = True
        elif status == STATUS_ITERATION_LIMIT and \
                nit < self.config.max_iters:
            # Numeric-stall exit (f32 drift faking eligible pivots), not
            # the user's cap.  A stall almost always means the optimality
            # tolerance sits below the f32 pricing noise at this problem's
            # scale — retry once with 10x looser device tol (the f64
            # certification + refinement still deliver the exact optimum),
            # and only then fall back to the slow host f64 engine.
            if _tol_scale == 1.0:
                res = self.solve(lp, warm_basis, _tol_scale=10.0)
                res.nit += nit
                res.solve_time = time.perf_counter() - t0
                return res
            escalated = True
        if escalated:
            status, basis_np, nit2 = _host_simplex_f64(sf)
            nit += nit2
            if status == STATUS_OPTIMAL:
                fin = _finalize_on_host(sf, lp, basis_np, sf64=sf)
                if fin[1] is None:
                    return self._fail(STATUS_ITERATION_LIMIT, nit, t0)
        if status != STATUS_OPTIMAL:
            return self._fail(status, nit, t0)

        certified, x_full, duals, reduced = fin
        c_min = -lp.c if lp.maximize else lp.c
        if x_full is not None and (escalated or self.config.refine):
            x = x_full[: lp.n_vars]
        else:
            x_B_np = np.asarray(x_B, np.float64)
            x = np.zeros((sf.n_pad,))
            x[np.asarray(basis)] = x_B_np
            x = x[: lp.n_vars]
        fun = float(c_min @ x)
        z_user = (-fun if lp.maximize else fun) + 0.0
        return SimplexResult(
            x=np.maximum(x, 0.0), fun=fun, status=0, success=True,
            message=STATUS_MESSAGES[STATUS_OPTIMAL], nit=nit,
            basis=basis_np, z=z_user,
            solve_time=time.perf_counter() - t0,
            duals=duals, reduced_costs=reduced,
        )

    @staticmethod
    def _check_warm_basis(sf, warm_basis) -> Optional[np.ndarray]:
        """Validate a saved basis: right shape, no artificials, invertible,
        primal-feasible for the new data.  None → cold start."""
        basis = np.asarray(warm_basis, dtype=np.int32).reshape(-1)
        if basis.shape[0] != sf.m_pad or np.any(basis < 0) or \
                np.any(basis >= sf.n_pad):
            return None
        art = sf.col_mask_p1 & ~sf.col_mask_p2
        if np.any(art[basis]):
            return None
        rows = sf.tableau.astype(np.float64)[: sf.m_pad]
        try:
            x_B = np.linalg.solve(rows[:, basis], rows[:, sf.n_pad])
        except np.linalg.LinAlgError:
            return None
        if not np.all(np.isfinite(x_B)) or np.any(x_B < -1e-9):
            return None
        return basis

    def _finish_failed(self, status: int, nit: int, lp, sf,
                       t0: float) -> SimplexResult:
        """Phase-1 failure: certify infeasibility in f64 before reporting."""
        status2, basis2, nit2 = _host_simplex_f64(sf)
        nit += nit2
        if status2 != STATUS_OPTIMAL:
            return self._fail(status2, nit, t0)
        _, x_full, duals, reduced = _finalize_on_host(sf, lp, basis2,
                                                      sf64=sf)
        if x_full is None:
            return self._fail(status, nit, t0)
        c_min = -lp.c if lp.maximize else lp.c
        x = x_full[: lp.n_vars]
        fun = float(c_min @ x)
        z_user = (-fun if lp.maximize else fun) + 0.0
        return SimplexResult(
            x=np.maximum(x, 0.0), fun=fun, status=0, success=True,
            message=STATUS_MESSAGES[STATUS_OPTIMAL], nit=nit,
            basis=basis2, z=z_user, solve_time=time.perf_counter() - t0,
            duals=duals, reduced_costs=reduced,
        )

    @staticmethod
    def _fail(status: int, nit: int, t0: float) -> SimplexResult:
        return SimplexResult(
            x=None, fun=None, status=status, success=False,
            message=STATUS_MESSAGES.get(status, "Unknown status."),
            nit=nit, solve_time=time.perf_counter() - t0,
        )

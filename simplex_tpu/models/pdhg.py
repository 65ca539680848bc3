"""Batched first-order LP solver (PDHG / PDLP-style).

BASELINE.json's 1M-instance regime: simplex pivots are sequential and
per-instance convergence varies wildly, but PDHG iterations are pure
matrix-vector products — exactly what the MXU wants, with every instance
advancing in lockstep.  This is the "batched first-order path" SURVEY.md §7
prescribes (cf. PAPERS.md first-order-LP survey: restarted PDHG is the
production approach behind PDLP).

Formulation (after normalizing ``>=`` rows to ``<=`` by negation):

    min c'x  s.t.  A x (<=|=) b,  x >= 0

saddle form  min_x max_y  c'x + y'(Ax - b)  with  y_i >= 0 on inequality
rows, free on equality rows.  Chambolle-Pock updates with extrapolation:

    x+ = max(0, x - tau (c + A'y))
    y+ = proj(y + sigma (A (2x+ - x) - b))

step sizes tau = sigma = 0.9 / ||A||_2 (power iteration), per instance.
Termination: primal feasibility, dual feasibility, and duality-gap residuals
below tol for every instance (masked), or the iteration cap.

This is an approximate solver (1e-4-ish residuals in f32); the exact-vertex
path remains the simplex engines.  For scenario sweeps ("solve these 1M
perturbed LPs approximately") it is the right tool and runs at matmul speed.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.problem import OP_EQ, OP_GE, OP_LE


@dataclasses.dataclass
class PdhgResult:
    x: np.ndarray           # (B, n)
    y: np.ndarray           # (B, m) duals
    objective: np.ndarray   # (B,) c'x in the USER sense
    primal_residual: np.ndarray
    dual_residual: np.ndarray
    gap: np.ndarray
    converged: np.ndarray   # (B,) bool
    iters: int
    solve_time: float = 0.0


def _power_iter_sigma_max(A, iters: int = 30):
    """Largest singular value per instance via power iteration on A'A."""
    B, m, n = A.shape
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (B, n), dtype=A.dtype)

    def body(_, v):
        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-30)
        w = jnp.einsum("bmn,bn->bm", A, v)
        v = jnp.einsum("bmn,bm->bn", A, w)
        return v

    v = lax.fori_loop(0, iters, body, v)
    lam = jnp.linalg.norm(v, axis=1) / (
        jnp.linalg.norm(lax.fori_loop(0, iters - 1, body, v), axis=1) + 1e-30)
    # Rayleigh fallback: ||Av|| / ||v||
    v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-30)
    Av = jnp.einsum("bmn,bn->bm", A, v)
    return jnp.linalg.norm(Av, axis=1)


@functools.partial(jax.jit, static_argnames=("max_iters", "tol",
                                             "check_every"))
def _pdhg_solve(A, b, c, is_eq, max_iters: int = 10000, tol: float = 1e-4,
                check_every: int = 50):
    """Core batched PDHG loop.  A: (B, m, n); b: (B, m); c: (B, n);
    is_eq: (B, m) bool."""
    B, m, n = A.shape
    dt = A.dtype

    sig_max = _power_iter_sigma_max(A)
    step = jnp.asarray(0.9, dt) / jnp.maximum(sig_max, 1e-12)   # (B,)
    tau = step[:, None]
    sigma = step[:, None]

    scale = 1.0 + jnp.maximum(
        jnp.max(jnp.abs(b), axis=1), jnp.max(jnp.abs(c), axis=1))

    def residuals(x, y):
        Ax = jnp.einsum("bmn,bn->bm", A, x)
        r_p = Ax - b
        # primal violation: eq rows |Ax-b|, ineq rows max(0, Ax-b)
        viol = jnp.where(is_eq, jnp.abs(r_p), jnp.maximum(r_p, 0.0))
        primal = jnp.max(viol, axis=1)
        # dual: c + A'y >= 0 (x >= 0 cone), complementarity via gap
        g = c + jnp.einsum("bmn,bm->bn", A, y)
        dual = jnp.max(jnp.maximum(-g, 0.0), axis=1)
        gap = jnp.abs(jnp.einsum("bn,bn->b", c, x)
                      + jnp.einsum("bm,bm->b", b, y))
        return primal, dual, gap

    def body(state):
        x, y, k, done = state

        grad_x = c + jnp.einsum("bmn,bm->bn", A, y)
        x_new = jnp.maximum(x - tau * grad_x, 0.0)
        x_bar = 2.0 * x_new - x
        y_new = y + sigma * (jnp.einsum("bmn,bn->bm", A, x_bar) - b)
        y_new = jnp.where(is_eq, y_new, jnp.maximum(y_new, 0.0))

        # Freeze converged instances.
        x = jnp.where(done[:, None], x, x_new)
        y = jnp.where(done[:, None], y, y_new)

        def check(_):
            primal, dual, gap = residuals(x, y)
            return (primal <= tol * scale) & (dual <= tol * scale) & \
                   (gap <= 10.0 * tol * scale)

        done = jnp.where((k % check_every) == 0, check(None) | done, done)
        return x, y, k + 1, done

    def cond(state):
        _x, _y, k, done = state
        return (~jnp.all(done)) & (k < max_iters)

    x0 = jnp.zeros((B, n), dt)
    y0 = jnp.zeros((B, m), dt)
    done0 = jnp.zeros((B,), bool)
    x, y, iters, done = lax.while_loop(cond, body, (x0, y0, jnp.int32(0),
                                                    done0))
    primal, dual, gap = residuals(x, y)
    return x, y, primal, dual, gap, done, iters


class PdhgSolver:
    """Batched first-order solver over uniform-shape array batches."""

    def __init__(self, tol: float = 1e-4, max_iters: int = 20000,
                 dtype=np.float32):
        self.tol = tol
        self.max_iters = max_iters
        self.dtype = np.dtype(dtype)

    def solve_arrays(self, c, A, b, ops, maximize=False) -> PdhgResult:
        t0 = time.perf_counter()
        A = np.asarray(A, np.float64)
        b = np.asarray(b, np.float64)
        c = np.asarray(c, np.float64)
        ops = np.asarray(ops)
        B, m, n = A.shape
        maximize = np.broadcast_to(np.asarray(maximize, bool), (B,))

        c_min = np.where(maximize[:, None], -c, c)
        # Normalize >= rows to <=.
        flip = (ops == OP_GE)[None, :]
        A_n = np.where(flip[:, :, None], -A, A)
        b_n = np.where(flip, -b, b)
        is_eq = np.broadcast_to((ops == OP_EQ)[None, :], (B, m))

        x, y, primal, dual, gap, done, iters = _pdhg_solve(
            jnp.asarray(A_n, self.dtype), jnp.asarray(b_n, self.dtype),
            jnp.asarray(c_min, self.dtype), jnp.asarray(is_eq),
            max_iters=self.max_iters, tol=self.tol,
        )
        x = np.asarray(x, np.float64)
        obj_min = np.einsum("bn,bn->b", c_min, x)
        objective = np.where(maximize, -obj_min, obj_min) + 0.0
        return PdhgResult(
            x=x, y=np.asarray(y, np.float64),
            objective=objective,
            primal_residual=np.asarray(primal, np.float64),
            dual_residual=np.asarray(dual, np.float64),
            gap=np.asarray(gap, np.float64),
            converged=np.asarray(done),
            iters=int(iters),
            solve_time=time.perf_counter() - t0,
        )

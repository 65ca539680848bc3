"""Pallas fused pivot-update kernel for large tableaus.

BASELINE config 3: "single large dense LP (10k x 10k tableau) exercising the
Pallas pivot-update kernel at HBM roofline".  The rank-1 row reduction

    T <- T - T[:, s] (outer) T[r, :] / T[r, s];   T[r, :] <- T[r, :]/T[r,s];
    T[:, s] <- e_r

touches every element of the tableau exactly once for read and once for
write — the HBM roofline is 2 * R * W * 4 bytes per pivot.  This kernel
fuses everything into one tiled read-modify-write with the pivot
coordinates as scalar-prefetch arguments.

Measured on v5e (8k x 8k f32, 256-pivot fused scan): this Pallas kernel
sustains ~308 GB/s while the pure-XLA ``where``-mask formulation now used by
``ops/tableau.pivot_update`` sustains ~580 GB/s — 99% of the chip's
empirical streaming ceiling (~586 GB/s; paper peak 819).  XLA's fusion of
the broadcasted-iota masks into the rank-1 update is already speed-of-light,
so the XLA path is the production default; this kernel is kept as the
explicitly-scheduled reference implementation (and the hook for future
fusion of pricing+ratio-test into the same pass, where XLA cannot help).

Layout contract: ``T`` is (R, W) with R % block_r == 0 and W % block_c == 0
(the large-LP path pads rows to a multiple of the row block and columns to a
multiple of 128; the objective row and RHS column live INSIDE the array, so
one kernel pass updates them all).  The thin side inputs — the scaled pivot
column ``T[:, s]/p`` and both pivot-row variants (raw for the rank-1 term,
normalized for the row override) — are O(R + W) bytes, computed outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pivot_kernel(r_ref, s_ref, T_ref, col_ref, prows_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    r = r_ref[0]
    s = s_ref[0]

    blk = T_ref[:, :]                       # (bm, bn)
    colb = col_ref[:, :]                    # (bm, 1) — T[:, s] / pivot
    prow = prows_ref[0:1, :]                # (1, bn) — raw pivot row
    prow_n = prows_ref[1:2, :]              # (1, bn) — pivot row / pivot
    bm, bn = blk.shape

    # Rank-1 elimination: row r of this intermediate becomes 0 and is then
    # overridden with the normalized pivot row; column s becomes e_r.
    out = blk - colb * prow

    gi = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    gj = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    is_r = gi == r
    is_s = gj == s
    out = jnp.where(is_r, jnp.broadcast_to(prow_n, (bm, bn)), out)
    out = jnp.where(is_s, jnp.where(is_r, 1.0, 0.0).astype(out.dtype), out)
    out_ref[:, :] = out


@functools.partial(jax.jit,
                   static_argnames=("block_r", "block_c", "interpret"))
def pivot_update_fused(T, r, s, block_r: int = 256, block_c: int = 512,
                       interpret: bool = False):
    """One fused pivot on a padded (R, W) tableau.  Returns the new tableau.

    ``r``/``s`` are traced int32 scalars (dynamic pivot position).  Set
    ``interpret=True`` off-TPU (CPU tests) to run the kernel in interpreter
    mode.
    """
    R, W = T.shape
    assert R % block_r == 0 and W % block_c == 0, (R, W, block_r, block_c)

    r = jnp.asarray(r, jnp.int32).reshape(1)   # rank>=1: Mosaic rejects
    s = jnp.asarray(s, jnp.int32).reshape(1)   # 0-rank scalar-prefetch refs
    pivot = T[r[0], s[0]]
    inv = 1.0 / pivot
    col = jax.lax.dynamic_slice(T, (0, s[0]), (R, 1)) * inv     # (R, 1)
    prow = jax.lax.dynamic_slice(T, (r[0], 0), (1, W))          # (1, W)
    prows = jnp.concatenate([prow, prow * inv], axis=0)         # (2, W)

    grid = (R // block_r, W // block_c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, block_c), lambda i, j, r_, s_: (i, j)),
            pl.BlockSpec((block_r, 1), lambda i, j, r_, s_: (i, 0)),
            pl.BlockSpec((2, block_c), lambda i, j, r_, s_: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_r, block_c),
                               lambda i, j, r_, s_: (i, j)),
    )
    return pl.pallas_call(
        _pivot_kernel,
        out_shape=jax.ShapeDtypeStruct((R, W), T.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(r, s, T, col, prows)

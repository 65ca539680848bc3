"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): simplex pivots/sec/chip at a 10k x 10k
tableau.  The per-pivot rank-1 tableau update is the HBM-bound hot op; the
roofline is ~2 array touches (read + write) of the full tableau per pivot.

``vs_baseline`` reports the achieved fraction of the chip's HBM roofline
for the per-pivot update (BASELINE.json north star: >= 0.80).  The
reference itself publishes no numbers (SURVEY.md §6) — its solve path is
scipy/HiGHS on CPU with a pure-Python tableau loop, which is orders of
magnitude below any TPU figure, so roofline fraction is the honest
denominator.

Run: ``python bench.py [--size N] [--iters K] [--batch]``
"""
import argparse
import json
import sys
import time

import numpy as np


# HBM peak bandwidth (GB/s) per chip generation; conservative defaults.
_HBM_PEAK = {
    "v5 lite": 819.0,   # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6e": 1640.0,
    "cpu": 50.0,
}


def _hbm_peak(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in _HBM_PEAK.items():
        if key in kind:
            return bw
    return _HBM_PEAK["cpu"]


def bench_pivot_update(size: int, iters: int):
    """Steady-state time per rank-1 pivot update on a (size+1)^2 tableau."""
    import jax
    import jax.numpy as jnp
    from simplex_tpu.ops.tableau import pivot_update

    dev = jax.devices()[0]
    m = n = size
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.normal(size=(m + 1, n + 1)).astype(np.float32))
    basis = jnp.arange(m, dtype=jnp.int32)

    upd = jax.jit(pivot_update)
    # Warmup / compile.
    T1, b1 = upd(T, basis, jnp.int32(1), jnp.int32(2))
    T1.block_until_ready()

    # Steady state with VARYING pivot positions: repeated identical
    # dispatches can be elided/deduplicated upstream and report impossible
    # bandwidths (observed >4 TB/s on a 819 GB/s part); varying (r, s) plus
    # a final checksum defeats that.
    rs = np.random.default_rng(1).integers(0, m, size=(iters, 2))
    t0 = time.perf_counter()
    Tc, bc = T1, b1
    for r_i, s_i in rs:
        Tc, bc = upd(Tc, bc, jnp.int32(r_i), jnp.int32(s_i))
    float(jnp.sum(Tc))  # checksum forces full materialization
    dt = (time.perf_counter() - t0) / iters

    bytes_moved = 2.0 * (m + 1) * (n + 1) * 4  # read + write, f32
    gbps = bytes_moved / dt / 1e9
    frac = gbps / _hbm_peak(dev)
    return {
        "metric": f"pivots_per_sec_{size}x{size}_f32",
        "value": round(1.0 / dt, 3),
        "unit": "pivots/s/chip",
        "vs_baseline": round(frac, 4),
        "detail": {
            "per_pivot_ms": round(dt * 1e3, 3),
            "achieved_GBps": round(gbps, 1),
            "hbm_peak_GBps": _hbm_peak(dev),
            "device": str(getattr(dev, "device_kind", dev)),
        },
    }


def bench_batched_solve(B: int = 1024, m: int = 30, n: int = 50):
    """Batched LPs solved/sec on one chip (BASELINE config 2 shape)."""
    import jax
    from simplex_tpu.models.batched import BatchedSimplexSolver

    rng = np.random.default_rng(0)
    # Feasible-by-construction dense LPs: Ax <= b with b > 0.
    A = rng.uniform(0.05, 1.0, size=(B, m, n)).astype(np.float32)
    b = rng.uniform(1.0, 5.0, size=(B, m)).astype(np.float32)
    c = rng.uniform(0.1, 1.0, size=(B, n)).astype(np.float32)
    ops = np.full((m,), -1)

    solver = BatchedSimplexSolver()
    res = solver.solve_arrays(c, A, b, ops, maximize=True)  # compile+run
    t0 = time.perf_counter()
    res = solver.solve_arrays(c, A, b, ops, maximize=True)
    dt = time.perf_counter() - t0
    return {
        "metric": f"batched_lps_per_sec_{B}x{m}x{n}",
        "value": round(B / dt, 1),
        "unit": "LPs/s/chip",
        "vs_baseline": round(res.n_optimal / B, 4),
        "detail": {"wall_s": round(dt, 3), "n_optimal": res.n_optimal,
                   "pivot_iters": res.nit},
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=8192,
                   help="tableau dimension for the pivot-update benchmark")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--batch", action="store_true",
                   help="run the batched-solve benchmark instead")
    args = p.parse_args()

    try:
        if args.batch:
            out = bench_batched_solve()
        else:
            out = bench_pivot_update(args.size, args.iters)
    except Exception as e:  # fall back to a smaller shape on OOM etc.
        sys.stderr.write(f"bench fallback ({type(e).__name__}: {e})\n")
        out = bench_pivot_update(2048, 20)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

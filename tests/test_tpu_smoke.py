"""TPU smoke lane (VERDICT r3 item 6): the production kernels on REAL TPU.

The main suite pins the CPU backend with 8 virtual devices (conftest.py),
so ``tests/test_pallas_batched.py`` exercises the fused kernel in
interpreter mode only.  These tests run the ACTUAL Mosaic-compiled kernel
and the dense device loop on the real chip — in a SUBPROCESS, because the
conftest's backend pin is process-wide and irreversible.

Opt-in (first compile costs minutes over the device tunnel):

    SIMPLEX_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -v

The builder runs this before committing a BENCH artifact; see
docs/testing_guide.md ("carril TPU").
"""
import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("SIMPLEX_TPU_SMOKE") != "1",
        reason="TPU smoke lane: set SIMPLEX_TPU_SMOKE=1 on a machine "
               "with a real TPU (runs the Mosaic kernel, not interpret "
               "mode; first compile takes minutes)"),
]

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run_on_device(script: str, timeout: int = 1200) -> str:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, "-u", "-c", script],
                         capture_output=True, text=True, timeout=timeout,
                         cwd=_REPO, env=env)
    assert out.returncode == 0, out.stderr[-4000:]
    return out.stdout


def test_pallas_fused_kernel_matches_xla_on_device():
    """The Pallas fused batched step vs the XLA step ON THE REAL CHIP:
    statuses identical, objectives equal to f32 round-off, and the f64
    certification accepts both."""
    out = _run_on_device("""
import numpy as np, jax
assert jax.default_backend() == "tpu", jax.default_backend()
from simplex_tpu.config import SolverConfig
from simplex_tpu.models.batched import BatchedSimplexSolver

rng = np.random.default_rng(4)
B, m, n = 256, 12, 16
A = rng.normal(size=(B, m, n)).round(2)
b = rng.uniform(-2, 9, size=(B, m)).round(2)
c = rng.normal(size=(B, n)).round(2)
ops = rng.choice([-1, 0, 1], size=m)
rp = BatchedSimplexSolver(SolverConfig(batched_backend="pallas")) \\
    .solve_arrays(c, A, b, ops, maximize=False)
rx = BatchedSimplexSolver(SolverConfig(batched_backend="xla")) \\
    .solve_arrays(c, A, b, ops, maximize=False)
np.testing.assert_array_equal(rp.status, rx.status)
ok = rp.status == 0
np.testing.assert_allclose(rp.z[ok], rx.z[ok], rtol=1e-6, atol=1e-6)
assert np.all(rp.certified) and np.all(rx.certified)
print("PALLAS_OK", int(ok.sum()), "of", B)
""")
    assert "PALLAS_OK" in out


def test_bounded_fused_kernel_matches_xla_on_device():
    """The BOUNDED fused Pallas step (round 5) vs the bounded XLA step on
    the real chip, through both the default and the phase2_only drivers:
    statuses and at-upper states identical, objectives to f32 round-off,
    certification accepts all."""
    out = _run_on_device("""
import numpy as np, jax
assert jax.default_backend() == "tpu", jax.default_backend()
from simplex_tpu.config import SolverConfig
from simplex_tpu.models.batched import BatchedSimplexSolver

rng = np.random.default_rng(7)
B, m, n = 256, 12, 16
A = rng.uniform(0.05, 1.0, size=(B, m, n)).round(2)
b = rng.uniform(1.0, 6.0, size=(B, m)).round(2)
c = rng.uniform(0.1, 1.0, size=(B, n)).round(2)
ub = np.where(rng.random((B, n)) < 0.6,
              rng.uniform(0.3, 3.0, (B, n)), np.inf)
ops = np.full(m, -1)          # all-<=: exercises the phase2_only driver
rp = BatchedSimplexSolver(SolverConfig(batched_backend="pallas")) \\
    .solve_arrays(c, A, b, ops, maximize=True, ub=ub)
rx = BatchedSimplexSolver(SolverConfig(batched_backend="xla")) \\
    .solve_arrays(c, A, b, ops, maximize=True, ub=ub)
np.testing.assert_array_equal(rp.status, rx.status)
ok = rp.status == 0
np.testing.assert_allclose(rp.z[ok], rx.z[ok], rtol=1e-6, atol=1e-6)
np.testing.assert_array_equal(rp.at_upper, rx.at_upper)
assert rp.at_upper.any(), "bounded machinery not exercised"
assert np.all(rp.certified) and np.all(rx.certified)
# Mixed ops: the DEFAULT (phase-1-capable) bounded driver on-chip too.
ops2 = np.array([-1, -1, -1, -1, 1, 1, 0, 0, -1, -1, -1, -1])
rp2 = BatchedSimplexSolver(SolverConfig(batched_backend="pallas")) \\
    .solve_arrays(c, A, b, ops2, maximize=True, ub=ub)
rx2 = BatchedSimplexSolver(SolverConfig(batched_backend="xla")) \\
    .solve_arrays(c, A, b, ops2, maximize=True, ub=ub)
np.testing.assert_array_equal(rp2.status, rx2.status)
ok2 = rp2.status == 0
np.testing.assert_allclose(rp2.z[ok2], rx2.z[ok2], rtol=1e-6, atol=1e-6)
assert np.all(rp2.certified) and np.all(rx2.certified)
print("BOUNDED_PALLAS_OK", int(ok.sum()), int(ok2.sum()), "of", B)
""")
    assert "BOUNDED_PALLAS_OK" in out


def test_dense_solve_on_device_hits_anchor():
    """One real dense device solve (the jitted while_loop on TPU) must hit
    the reference anchor Z = 9833.333 and a 512x512 random LP must match
    scipy."""
    out = _run_on_device("""
import numpy as np, jax
assert jax.default_backend() == "tpu", jax.default_backend()
import simplex_tpu as st
from scipy.optimize import linprog

r = st.solve_lp(st.LinearProgram(
    c=[15, 18], A=[[4, 2], [2, 6], [20, 28]], b=[2000, 2400, 14000],
    ops=[-1, -1, -1], maximize=True))
assert r.success and abs(r.z - 9833.3333333) < 1e-3, r.z

rng = np.random.default_rng(0)
m = n = 512
A = rng.uniform(0.05, 1.0, size=(m, n))
b = rng.uniform(m * 0.3, m * 0.6, size=m)
c = rng.uniform(0.1, 1.0, size=n)
res = st.solve_lp(st.LinearProgram(c=c, A=A, b=b, ops=np.full(m, -1),
                                   maximize=True))
ref = linprog(-c, A_ub=A, b_ub=b, method="highs")
assert res.success
assert abs(res.z + ref.fun) < 1e-6 * (1 + abs(ref.fun)), (res.z, -ref.fun)
print("DENSE_OK", res.nit)
""")
    assert "DENSE_OK" in out

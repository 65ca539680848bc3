import os, sys, time
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from simplex_tpu.parallel.sharded import make_mesh, solve_arrays_sharded

m = int(sys.argv[1]); n = int(sys.argv[2])
rng = np.random.default_rng(42)
A = rng.uniform(0.05, 1.0, size=(1, m, n))
x0 = rng.uniform(0.5, 1.5, size=n)
b = (A[0] @ x0 + rng.uniform(0.05, 0.5, size=m))[None, :]
c = rng.uniform(0.1, 1.0, size=(1, n))
ops = np.full((m,), -1)
mesh = make_mesh(batch=1, row=int(sys.argv[3]) if len(sys.argv) > 3 else 8)
t0 = time.perf_counter()
res = solve_arrays_sharded(c, A, b, ops, maximize=True, mesh=mesh, max_iters=512, certify=True)
wall = time.perf_counter() - t0
print(f"m={m} n={n}: status={res['status']}, z={res['z']}, iters={res['iters']}, certified={res['certified']}, wall={wall:.1f}s")

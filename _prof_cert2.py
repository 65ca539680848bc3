import numpy as np, time
from simplex_tpu.models.batched import BatchedSimplexSolver
from simplex_tpu.models.certify import certify_and_escalate_raw
from simplex_tpu.config import SolverConfig

chunk, m, n = 65536, 30, 50
rng = np.random.default_rng(0)
A = rng.uniform(0.05, 1.0, size=(chunk, m, n)).astype(np.float32)
b = rng.uniform(1.0, 5.0, size=(chunk, m)).astype(np.float32)
c = rng.uniform(0.1, 1.0, size=(chunk, n)).astype(np.float32)
ops = np.full((m,), -1)
solver = BatchedSimplexSolver(SolverConfig(certify=False))
res = solver.solve_arrays(c, A, b, ops, maximize=True)
status = np.array(res.status); basis = np.array(res.basis)
t0 = time.perf_counter()
fix = certify_and_escalate_raw(status, basis, np.asarray(c, np.float64),
                               np.asarray(A, np.float64), np.asarray(b, np.float64),
                               ops, np.broadcast_to(np.asarray(True), (chunk,)))
print(f'raw certify wall: {time.perf_counter()-t0:.1f}s, certified={fix["certified"].sum()}, escalated={fix["escalated"].sum()}')

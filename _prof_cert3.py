import numpy as np, time, cProfile, pstats
from simplex_tpu.models.batched import BatchedSimplexSolver
from simplex_tpu.models.certify import certify_sweep_le_f64
from simplex_tpu.config import SolverConfig

chunk, m, n = 65536, 30, 50
rng = np.random.default_rng(0)
A = rng.uniform(0.05, 1.0, size=(chunk, m, n)).astype(np.float32)
b = rng.uniform(1.0, 5.0, size=(chunk, m)).astype(np.float32)
c = rng.uniform(0.1, 1.0, size=(chunk, n)).astype(np.float32)
ops = np.full(m, -1)
res = BatchedSimplexSolver(SolverConfig(certify=False)).solve_arrays(c, A, b, ops, maximize=True)
status = np.array(res.status); basis = np.array(res.basis)
pr = cProfile.Profile(); pr.enable()
t0 = time.perf_counter()
fix = certify_sweep_le_f64(status, basis, c, A, b, True)
print(f'wall {time.perf_counter()-t0:.1f}s')
pr.disable()
pstats.Stats(pr).sort_stats('tottime').print_stats(10)

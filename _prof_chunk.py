import numpy as np, time
import jax
from simplex_tpu.models.batched import (BatchedSimplexSolver,
                                        certify_uniform_result,
                                        compile_batch_on_device)
from simplex_tpu.config import SolverConfig

chunk, m, n = 65536, 30, 50
t0 = time.perf_counter()
rng = np.random.default_rng(0)
A = rng.uniform(0.05, 1.0, size=(chunk, m, n)).astype(np.float32)
b = rng.uniform(1.0, 5.0, size=(chunk, m)).astype(np.float32)
c = rng.uniform(0.1, 1.0, size=(chunk, n)).astype(np.float32)
print(f'gen: {time.perf_counter()-t0:.1f}s')
solver = BatchedSimplexSolver(SolverConfig(certify=False))
ops = np.full(m, -1)
res = solver.solve_arrays(c, A, b, ops, maximize=True)   # warm compile
for name in ('solve2', 'solve3'):
    t0 = time.perf_counter()
    res = solver.solve_arrays(c, A, b, ops, maximize=True)
    print(f'{name} (incl extract): {time.perf_counter()-t0:.1f}s')
t0 = time.perf_counter()
res2 = certify_uniform_result(res, c, A, b, ops, True)
print(f'certify(fast): {time.perf_counter()-t0:.1f}s certified={res2.certified.sum()}')

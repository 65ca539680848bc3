import numpy as np, time, cProfile, pstats
from simplex_tpu.models.batched import BatchedSimplexSolver, certify_uniform_result
from simplex_tpu.config import SolverConfig

chunk, m, n = 65536, 30, 50
rng = np.random.default_rng(0)
A = rng.uniform(0.05, 1.0, size=(chunk, m, n)).astype(np.float32)
b = rng.uniform(1.0, 5.0, size=(chunk, m)).astype(np.float32)
c = rng.uniform(0.1, 1.0, size=(chunk, n)).astype(np.float32)
ops = np.full((m,), -1)
solver = BatchedSimplexSolver(SolverConfig(certify=False))
res = solver.solve_arrays(c, A, b, ops, maximize=True)
print('solve done, optimal:', res.n_optimal)
t0 = time.perf_counter()
pr = cProfile.Profile(); pr.enable()
res = certify_uniform_result(res, c, A, b, ops, True)
pr.disable()
print(f'certify wall: {time.perf_counter()-t0:.1f}s, certified={res.certified.sum()}')
pstats.Stats(pr).sort_stats('cumulative').print_stats(18)

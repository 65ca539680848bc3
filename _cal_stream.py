import numpy as np, time
from simplex_tpu.models.batched import solve_arrays_stream
from simplex_tpu.config import SolverConfig

chunk, m, n = 65536, 30, 50
def gen(nc):
    for k in range(nc):
        rng = np.random.default_rng(200 + k)
        A = rng.uniform(0.05, 1.0, size=(chunk, m, n)).astype(np.float32)
        b = rng.uniform(1.0, 5.0, size=(chunk, m)).astype(np.float32)
        c = rng.uniform(0.1, 1.0, size=(chunk, n)).astype(np.float32)
        yield c, A, b, np.full((m,), -1)

for certify in (False, True):
    cfg = SolverConfig(certify=certify)
    t0 = time.perf_counter()
    tot = opt = cert = 0
    for res in solve_arrays_stream(gen(2), config=cfg, maximize=True):
        tot += res.status.shape[0]; opt += res.n_optimal
        cert += 0 if res.certified is None else int(res.certified.sum())
    wall = time.perf_counter() - t0
    print(f"certify={certify}: {tot} LPs in {wall:.1f}s = {tot/wall:.0f} LPs/s, optimal={opt}, certified={cert}")

"""Memory-bandwidth scaling control: aggregate streaming throughput of
p concurrent workers, p in {1,4,16}."""
import multiprocessing as mp
import time

import numpy as np


def stream(_):
    a = np.ones(64 * 1024 * 1024 // 8)  # 64 MB
    t0 = time.time()
    s, n = 0.0, 0
    while time.time() - t0 < 4.0:
        s += a.sum()          # streaming read, ~64MB per pass
        n += 1
    return n * 64  # MB read


if __name__ == "__main__":
    for p in (1, 4, 16):
        with mp.Pool(p) as pool:
            t0 = time.time()
            tot = sum(pool.map(stream, range(p)))
            dt = time.time() - t0
        print(f"procs={p:2d} aggregate={tot/dt/1024:.1f} GB/s")

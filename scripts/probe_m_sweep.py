"""Throughput vs batch size M (and optionally K) on the real chip.
Each config = one full TpuBwt build of M x 101bp RLO; reports Msym/s.
Env: SWEEP_CONFIGS="M:K,M:K,..." (default "262144:256,524288:256").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run_cfg(m, k, L=101, so=1, reps=2):
    import jax
    from ropebwt2_tpu.engine import TpuBwt

    rng = np.random.default_rng(0)
    reads = rng.integers(1, 5, size=(m, L)).astype(np.int8)
    syms = m * (L + 1)
    best = None
    for i in range(reps + 1):  # first rep includes compile
        eng = TpuBwt(so=so, K=k)
        t0 = time.time()
        eng.insert_multi(reads)
        cnt = eng.counts()
        dt = time.time() - t0
        assert int(cnt.sum()) == syms
        tag = "compile+run" if i == 0 else "run"
        print(f"SWEEP M={m} K={k}: {dt:.3f}s ({syms/dt/1e6:.2f} Msym/s) [{tag}]",
              flush=True)
        if i > 0:
            best = dt if best is None else min(best, dt)
    print(f"SWEEP BEST M={m} K={k}: {best:.3f}s {syms/best/1e6:.2f} Msym/s "
          f"({best/ (L+1) * 1e3:.2f} ms/round)", flush=True)


def main():
    cfgs = os.environ.get("SWEEP_CONFIGS", "262144:256,524288:256")
    for part in cfgs.split(","):
        m, k = part.split(":")
        run_cfg(int(m), int(k))


if __name__ == "__main__":
    main()

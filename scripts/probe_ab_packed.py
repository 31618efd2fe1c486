"""A/B the packed vs unpacked host-transfer path in one process, alternating
runs to cancel chip drift."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    from ropebwt2_tpu.engine import TpuBwt

    M, L, K = 1 << 17, 101, 128
    rng = np.random.default_rng(0)
    reads = rng.integers(1, 5, size=(M, L)).astype(np.int8)
    syms = M * (L + 1)

    def run(packed):
        os.environ["ROPEBWT2_TPU_PACKED"] = "1" if packed else "0"
        eng = TpuBwt(so=1, K=K)
        t0 = time.time()
        eng.insert_multi(reads)
        cnt = eng.counts()
        dt = time.time() - t0
        assert int(cnt.sum()) == syms
        return dt

    # compile both
    run(True)
    run(False)
    best = {True: 1e9, False: 1e9}
    for rep in range(4):
        for packed in (True, False):
            dt = run(packed)
            best[packed] = min(best[packed], dt)
            print(f"AB packed={packed} rep{rep}: {dt:.3f}s "
                  f"({syms/dt/1e6:.2f} Msym/s)", flush=True)
    for packed in (True, False):
        print(f"AB BEST packed={packed}: {best[packed]:.3f}s "
              f"({syms/best[packed]/1e6:.2f} Msym/s)", flush=True)


if __name__ == "__main__":
    main()

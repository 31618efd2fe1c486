"""On-hardware probe of the deferred-merge path (index/pending.py):

1. PARITY: a multi-batch RLO build with forced defer_r in {0, 4, 16} must
   produce byte-identical BWTs on the real TPU (round-2 lesson: TPU-only
   numeric corruption exists; CPU tests are not sufficient evidence).
2. PERF: sustained regime A/B — prefill the index to PROBE_PREFILL reads,
   then time PROBE_TIMED additional batches with defer off vs auto.

Env: PROBE_M (batch reads, default 2^17), PROBE_L (101), PROBE_PREFILL
(prefill batches, default 8), PROBE_TIMED (default 2), PROBE_PARITY=0 to
skip step 1.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def md5_bwt(eng):
    import hashlib

    return hashlib.md5(eng.bwt_array().tobytes()).hexdigest()


def main():
    import jax

    from ropebwt2_tpu.engine import TpuBwt

    dev = jax.devices()[0]
    print(f"[probe] device {dev.platform}:{dev.device_kind}", flush=True)

    M = int(os.environ.get("PROBE_M", 1 << 17))
    L = int(os.environ.get("PROBE_L", 101))
    n_pre = int(os.environ.get("PROBE_PREFILL", 8))
    n_timed = int(os.environ.get("PROBE_TIMED", 2))

    # --- 1. parity across deferral depths (small, fast) ---
    if os.environ.get("PROBE_PARITY", "1") == "1":
        rng = np.random.default_rng(3)
        small = [rng.integers(1, 5, size=(4096, 64)).astype(np.int8)
                 for _ in range(3)]
        sums = {}
        for r in (0, 4, 16):
            eng = TpuBwt(so=1, defer_r=r)
            for b in small:
                eng.insert_multi(b)
            sums[r] = md5_bwt(eng)
            print(f"[probe] parity defer_r={r}: {sums[r]}", flush=True)
        assert len(set(sums.values())) == 1, sums
        print("[probe] PARITY OK", flush=True)

    # --- 2. sustained-regime A/B ---
    rng = np.random.default_rng(9)
    batches = [rng.integers(1, 5, size=(M, L)).astype(np.int8)
               for _ in range(n_pre + n_timed)]
    results = {}
    modes = (("defer0", 0), ("defer16", 16))
    if os.environ.get("PROBE_AUTO") == "1":
        modes = modes + (("auto", -1),)
    for mode, r in modes:
        eng = TpuBwt(so=1, defer_r=r)
        eng._plan(len(batches) * M * (L + 1))
        t0 = time.time()
        for b in batches[:n_pre]:
            eng.insert_multi(b)
        eng.counts()
        t1 = time.time()
        for b in batches[n_pre:]:
            eng.insert_multi(b)
        cnt = eng.counts()
        t2 = time.time()
        assert int(cnt[0]) == len(batches) * M
        syms = n_timed * M * (L + 1)
        thr = syms / (t2 - t1)
        results[mode] = thr
        print(f"[probe] {mode}: prefill {t1-t0:.1f}s, timed {t2-t1:.2f}s "
              f"-> sustained {thr/1e6:.2f} Msym/s "
              f"(n={int(cnt.sum())/1e6:.0f}M live)", flush=True)
    base = results["defer0"]
    for k, v in results.items():
        if k != "defer0":
            print(f"[probe] speedup {k}/defer0: {v/base:.2f}x", flush=True)


if __name__ == "__main__":
    main()

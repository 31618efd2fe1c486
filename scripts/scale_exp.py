"""Gsym-scale sustained-throughput EXPERIMENT (no md5): prefill a ~1 Gsym
coverage index, then time steady batches — for sweeping M / tier / defer
knobs without paying a full artifact run each time.

Env: EXP_M (2^20), EXP_PREFILL (8), EXP_TIMED (2), EXP_L (101),
EXP_COV (47), EXP_ERR (0.01), plus the engine envs
(ROPEBWT2_TPU_PACK4 / _RUNS / _DEFER_R / _PALLAS).  Prints per-batch
device walls (generation excluded — batches are pre-generated).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np


def main():
    M = int(os.environ.get("EXP_M", 1 << 20))
    L = int(os.environ.get("EXP_L", 101))
    prefill = int(os.environ.get("EXP_PREFILL", 8))
    timed = int(os.environ.get("EXP_TIMED", 2))

    import jax

    from readgen import ReadGen
    from ropebwt2_tpu.engine import TpuBwt

    dev = jax.devices()[0]
    nb = prefill + timed
    syms = M * (L + 1)
    print(f"[exp] {dev.device_kind} M={M} prefill={prefill} timed={timed} "
          f"total={nb*syms/1e9:.3f}G "
          f"PACK4={os.environ.get('ROPEBWT2_TPU_PACK4','auto')} "
          f"RUNS={os.environ.get('ROPEBWT2_TPU_RUNS','0')} "
          f"R={os.environ.get('ROPEBWT2_TPU_DEFER_R','-1')}", flush=True)
    gen = ReadGen(seed=99, nreads=M * nb, L=L, mode="coverage",
                  cov=float(os.environ.get("EXP_COV", 47.0)),
                  err=float(os.environ.get("EXP_ERR", 0.01)))
    eng = TpuBwt(so=1, K=int(os.environ.get("EXP_K", 128)))
    eng._plan(nb * syms)
    print(f"[exp] capacity {eng.state.cap/1e9:.3f}G "
          f"tier={type(eng.state).__name__}", flush=True)
    t0 = time.time()
    for i in range(prefill):
        reads = gen.batch(M).view(np.int8)
        tb = time.time()
        eng.insert_multi(reads)
        eng.counts()
        print(f"[exp] prefill {i}: {time.time()-tb:.2f}s", flush=True)
    print(f"[exp] prefill total {time.time()-t0:.1f}s", flush=True)
    walls = []
    for i in range(timed):
        reads = gen.batch(M).view(np.int8)
        tb = time.time()
        eng.insert_multi(reads)
        eng.counts()
        walls.append(time.time() - tb)
        print(f"[exp] timed {i}: {walls[-1]:.2f}s "
              f"({syms/walls[-1]/1e6:.2f} Msym/s)", flush=True)
    best = min(walls)
    out = {
        "M": M, "prefill_sym": prefill * syms,
        "steady_sym_s": round(syms / best, 1),
        "walls": [round(w, 2) for w in walls],
        "pack4": os.environ.get("ROPEBWT2_TPU_PACK4", "auto"),
        "runs": os.environ.get("ROPEBWT2_TPU_RUNS", "0"),
        "defer": os.environ.get("ROPEBWT2_TPU_DEFER_R", "-1"),
    }
    print("[exp] RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Sharded engine ON THE REAL CHIP at D=1 (VERDICT r4 item 5): measure the
wall-clock ratio of the sharded code path (shard_map over a 1-device mesh:
all exchange/padding/slot machinery live, collectives degenerate) against
the local engine on the same batches — the first on-hardware data point
for parallel/sharded.py.

Writes SHARDED_D1_r05.json.  Env: D1_M (2^17), D1_L (101), D1_BATCHES (4).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np


def main():
    M = int(os.environ.get("D1_M", 1 << 17))
    L = int(os.environ.get("D1_L", 101))
    nb = int(os.environ.get("D1_BATCHES", 4))

    import jax

    from readgen import ReadGen
    from ropebwt2_tpu.engine import TpuBwt
    from ropebwt2_tpu.parallel.sharded import ShardedTpuBwt

    dev = jax.devices()[0]
    print(f"[d1] device {dev.platform}:{dev.device_kind}", flush=True)
    gen = ReadGen(seed=5, nreads=M * nb, L=L, mode="coverage")
    batches = [gen.batch(M).view(np.int8) for _ in range(nb)]
    syms = M * (L + 1)

    def run(make):
        eng = make()
        eng._plan((nb + 1) * syms)  # preallocate: no regrowth recompiles
        walls = []
        for i, b in enumerate(batches):
            t0 = time.time()
            eng.insert_multi(b)
            cnt = eng.counts()
            walls.append(time.time() - t0)
            print(f"[d1]   batch {i}: {walls[-1]:.2f}s", flush=True)
        assert int(cnt.sum()) == syms * nb
        md5 = _md5(eng.bwt_array())
        return walls, md5

    import hashlib

    def _md5(bwt):
        h = hashlib.md5()
        h.update(np.ascontiguousarray(bwt).tobytes())
        return h.hexdigest()

    print("[d1] local engine", flush=True)
    lw, lmd5 = run(lambda: TpuBwt(so=1))
    print("[d1] sharded engine (D=1 mesh)", flush=True)
    sw, smd5 = run(lambda: ShardedTpuBwt(so=1))
    assert smd5 == lmd5, (smd5, lmd5)
    # steady comparison: skip each engine's first (compile-carrying) batch
    ls = min(lw[1:]) if len(lw) > 1 else lw[0]
    ss = min(sw[1:]) if len(sw) > 1 else sw[0]
    out = {
        "metric": "sharded_d1_overhead",
        "device": f"{dev.platform}:{dev.device_kind}",
        "reads_per_batch": M,
        "read_len": L,
        "local_batch_walls_s": [round(w, 2) for w in lw],
        "sharded_batch_walls_s": [round(w, 2) for w in sw],
        "local_steady_s": round(ls, 3),
        "sharded_steady_s": round(ss, 3),
        "sharded_over_local": round(ss / ls, 3),
        "md5_equal": True,
        "note": "shard_map over a 1-device mesh: routing/slot-cap/"
                "exchange machinery live, collectives degenerate",
    }
    with open("/root/repo/SHARDED_D1_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("[d1] RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

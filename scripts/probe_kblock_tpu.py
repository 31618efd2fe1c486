"""Block-size sweep of the merge kernel: if per-window fixed costs (the 32
stack copies + per-op overhead) dominate over data passes, coarser expand
blocks (fewer windows per super-block) should win despite longer ladders.
Env: KB_CAP_LOG2 (28), KB_M (2^21), KB_BLOCKS ("4096,8192,16384,32768"),
KB_FUSED (0/1)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.flat import PAD_TAIL
from ropebwt2_tpu.index.merge_pallas import merge_pallas

M = int(os.environ.get("KB_M", 1 << 21))
cap = 1 << int(os.environ.get("KB_CAP_LOG2", 28))
blocks = [int(b) for b in
          os.environ.get("KB_BLOCKS", "4096,8192,16384,32768").split(",")]
fused = os.environ.get("KB_FUSED", "0") == "1"
dev = jax.devices()[0]
print(f"KBLOCK device {dev.device_kind} cap=2^{cap.bit_length()-1} M={M} "
      f"fused={fused}", flush=True)

rng = np.random.default_rng(5)
n = cap - (M + (1 << 20))
syms = np.full(cap + PAD_TAIL, 6, np.int8)
syms[:n] = rng.integers(0, 6, n, dtype=np.uint8).view(np.int8) % 6
pos = np.sort(rng.integers(0, n + 1, M)).astype(np.int32)
sym = rng.integers(0, 6, M).astype(np.int32)
stream = np.arange(M, dtype=np.int32)
valid = np.ones(M, bool)
jb = jnp.asarray(syms)
jn = jnp.asarray(n, jnp.int64)
jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]

ref = None
for blk in blocks:
    f = jax.jit(lambda b, p, s, t, v, _blk=blk: merge_pallas(
        b, p, s, t, v, n=jn, K=128, block=_blk, fused=fused))
    out = f(jb, *jargs)
    got = np.asarray(out[0][: 1 << 20])
    if ref is None:
        ref = got
    else:
        assert np.array_equal(ref, got), f"block {blk} mismatch"
    ts = []
    for _ in range(6):
        t0 = time.time()
        o = f(jb, *jargs)
        _ = np.asarray(o[0][:128])
        ts.append(time.time() - t0)
    print(f"KBLOCK B={blk:6d}: {sorted(ts)[len(ts)//2]*1e3:7.1f} ms",
          flush=True)

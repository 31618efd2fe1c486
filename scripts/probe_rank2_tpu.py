"""On-chip check of the fused two-point rank paths at production shapes
(the windowed (2,K)-slice lax.gather is new this round; batch 1 of the
M=2^20 scale experiment crashed the TPU worker at the first execution of
these branches — this isolates them).

Env: R2_N (2^28), R2_Q (2^20), R2_PCAP (2^23).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.rank import build_block_tables, rank_global, \
    rank2_global
from ropebwt2_tpu.index.pending import (
    KP, PendingIndex, pending_rank, pending_rank2,
)

I32 = np.int32
N = int(os.environ.get("R2_N", 1 << 28))
Q = int(os.environ.get("R2_Q", 1 << 20))
PCAP = int(os.environ.get("R2_PCAP", 1 << 23))
K = 128
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"R2 device {dev.platform}:{dev.device_kind} N={N} Q={Q} "
      f"PCAP={PCAP}", flush=True)

bwt = rng.integers(0, 6, N).astype(np.int8)
jb = jnp.asarray(bwt)
blkp = build_block_tables(jb, K, dtype=jnp.int32)
gl = np.sort(rng.integers(0, N - 200, Q).astype(I32))
wid = rng.integers(0, 129, Q).astype(I32)
gu = gl + wid

t0 = time.time()
ol, ou = jax.jit(rank2_global, static_argnames=("K",))(
    jb, blkp, jnp.asarray(gl), jnp.asarray(gu), K=K
)
ol, ou = np.asarray(ol), np.asarray(ou)
print(f"R2 rank2_global ran {time.time()-t0:.1f}s", flush=True)
rl = np.asarray(jax.jit(rank_global, static_argnames=("K",))(
    jb, blkp, jnp.asarray(gl), K=K))
ru = np.asarray(jax.jit(rank_global, static_argnames=("K",))(
    jb, blkp, jnp.asarray(gu), K=K))
print(f"R2 rank2_global parity: l={np.array_equal(ol, rl)} "
      f"u={np.array_equal(ou, ru)}", flush=True)

pfill = PCAP // 2
vp = np.full(PCAP, np.iinfo(I32).max - (1 << 28), I32)
vp[:pfill] = np.sort(rng.integers(0, N, pfill).astype(I32))
psym = np.full(PCAP, 6, np.int8)
psym[:pfill] = rng.integers(0, 6, pfill)
jp = jnp.asarray(psym)
pend = PendingIndex(vp=jnp.asarray(vp), psym=jp,
                    blk_prefix=build_block_tables(jp, KP, dtype=jnp.int32),
                    p=jnp.asarray(pfill, jnp.int32))
t0 = time.time()
pl, el, pu, eu = jax.jit(pending_rank2)(
    pend, jnp.asarray(gl), jnp.asarray(gu)
)
pl, el, pu, eu = map(np.asarray, (pl, el, pu, eu))
print(f"R2 pending_rank2 ran {time.time()-t0:.1f}s", flush=True)
rpl, rel = map(np.asarray, jax.jit(pending_rank)(pend, jnp.asarray(gl)))
rpu, reu = map(np.asarray, jax.jit(pending_rank)(pend, jnp.asarray(gu)))
print(f"R2 pending_rank2 parity: pl={np.array_equal(pl, rpl)} "
      f"el={np.array_equal(el, rel)} pu={np.array_equal(pu, rpu)} "
      f"eu={np.array_equal(eu, reu)}", flush=True)
print("R2 DONE", flush=True)

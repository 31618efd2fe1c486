"""On-chip parity + timing of the Pallas pending-merge kernel vs the XLA
pending_add (interpret mode already agrees; Mosaic/hardware behavior is
what this checks — round-4 found hw-only corruption classes).

Env: PK_PCAP (2^17), PK_M (2^15), PK_ROUNDS (4).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.pending import (
    KP, PendingIndex, _inf, _pending_add_pallas, pending_add,
    searchsorted_blocked,
)
from ropebwt2_tpu.index.rank import build_block_tables

I32 = np.int32
PCAP = int(os.environ.get("PK_PCAP", 1 << 17))
M = int(os.environ.get("PK_M", 1 << 15))
ROUNDS = int(os.environ.get("PK_ROUNDS", 4))
NMAX = 1 << 28
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"PK device {dev.platform}:{dev.device_kind} PCAP={PCAP} M={M}",
      flush=True)

vp = np.full(PCAP, np.iinfo(I32).max - (1 << 28), I32)
psym = np.full(PCAP, 6, np.int8)
jp = jnp.asarray(psym)
pend_x = PendingIndex(vp=jnp.asarray(vp), psym=jp,
                      blk_prefix=build_block_tables(jp, KP, dtype=jnp.int32),
                      p=jnp.asarray(0, jnp.int32))
pend_k = pend_x


@jax.jit
def step_xla(pend, gX, sym, stream, active):
    return pending_add(pend, gX, sym, stream, active)


@jax.jit
def step_kern(pend, gX, sym, stream, active):
    INF = _inf(jnp.int32)
    gq = jnp.where(active, gX, INF)
    k = searchsorted_blocked(pend.vp, gq)
    slot = jnp.where(active, stream + k, PCAP)
    sarr = jnp.zeros((PCAP,), jnp.int8).at[slot].set(
        (sym + 1).astype(jnp.int8), mode="drop", unique_indices=True)
    varr = jnp.zeros((PCAP,), jnp.int32).at[slot].set(
        gX + stream, mode="drop", unique_indices=True)
    return _pending_add_pallas(pend, varr, sarr, active)


for r in range(ROUNDS):
    A = M if r == 0 else int(rng.integers(M // 2, M))
    gX = np.zeros(M, I32)
    gX[:A] = np.sort(rng.integers(0, NMAX, A).astype(I32))
    sym = rng.integers(0, 6, M).astype(I32)
    stream = np.zeros(M, I32)
    stream[:A] = np.arange(A)
    active = np.arange(M) < A
    args = (jnp.asarray(gX), jnp.asarray(sym), jnp.asarray(stream),
            jnp.asarray(active))
    t0 = time.time()
    pend_x = step_xla(pend_x, *args)
    vx = np.asarray(pend_x.vp)
    tx = time.time() - t0
    t0 = time.time()
    pend_k = step_kern(pend_k, *args)
    vk = np.asarray(pend_k.vp)
    tk = time.time() - t0
    ok_v = np.array_equal(vx, vk)
    ok_s = np.array_equal(np.asarray(pend_x.psym), np.asarray(pend_k.psym))
    live_rows = int(pend_x.p) // KP + 1
    ok_t = np.array_equal(
        np.asarray(pend_x.blk_prefix)[:live_rows],
        np.asarray(pend_k.blk_prefix)[:live_rows],
    )
    print(f"PK round {r}: A={A} vp={ok_v} psym={ok_s} table={ok_t} "
          f"p={int(pend_x.p)}=={int(pend_k.p)} "
          f"(xla {tx:.2f}s, kern {tk:.2f}s)", flush=True)
    if not (ok_v and ok_s and ok_t):
        bad = np.flatnonzero(vx != vk)[:8]
        print("PK DIFF at", bad, vx[bad], vk[bad], flush=True)
        sys.exit(1)
print("PK ALL OK", flush=True)

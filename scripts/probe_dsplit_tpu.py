"""On-hardware split of the DEFERRED BCR round at sustained-regime shapes
(n ~ 2^27 live, M = 2^17 reads, K = 128, pcap = 2^21): plain round vs
deferred inner round vs its pieces (rank_virtual, pending_add) vs the
flush merge — chained fori_loops, differenced chain lengths (the only
trustworthy timing recipe on the tunneled backend, see HACKING.md).

Env: PROBE_M, PROBE_CAP_LOG2 (default 28), PROBE_PCAP (default 2^21).
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import (
    I32, ReadStates, bcr_round_impl, plan_round,
)
from ropebwt2_tpu.index.flat import FlatBwt, PAD_TAIL
from ropebwt2_tpu.index.pending import (
    KP, PendingIndex, pending_add, rank_virtual, searchsorted_blocked,
)
from ropebwt2_tpu.index.rank import build_block_tables, rank_global
from ropebwt2_tpu.index.merge_pallas import merge_pallas
from ropebwt2_tpu.oracle import SO_RLO

M = int(os.environ.get("PROBE_M", 1 << 17))
CAP = 1 << int(os.environ.get("PROBE_CAP_LOG2", 28))
PCAP = int(os.environ.get("PROBE_PCAP", 1 << 21))
L = 101
K = 128
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"DSPLIT device {dev.platform}:{dev.device_kind} M={M} CAP={CAP} "
      f"PCAP={PCAP}", flush=True)

n0 = CAP // 2
bwt = np.full(CAP + PAD_TAIL, 6, np.int8)
bwt[:n0] = rng.integers(0, 6, n0)
jb = jnp.asarray(bwt)
blkp = build_block_tables(jb, K, dtype=jnp.int32)
psize = np.full(6, n0 // 6, np.int64); psize[5] = n0 - psize[:5].sum()
pc = np.zeros((6, 6), np.int64)
for b in range(6):
    pc[b, :] = psize[b] // 6
    pc[b, 5] = psize[b] - pc[b, :5].sum()
state = FlatBwt(bwt=jb, n=jnp.asarray(n0, jnp.int64),
                psize=jnp.asarray(psize), pcounts=jnp.asarray(pc),
                blk_prefix=blkp)

STRIDE = 104
buf = np.zeros(M * STRIDE, np.int8)
buf.reshape(M, STRIDE)[:, :L] = rng.integers(1, 5, (M, L))[:, ::-1]
jbuf = jnp.asarray(buf)
pk = (np.arange(M, dtype=np.int32) * STRIDE) | rng.integers(1, 5, M).astype(np.int32)
l = np.sort(rng.integers(0, n0 // 8, M)).astype(np.int32)
u = (l + rng.integers(0, 3, M)).astype(np.int32)
rs = ReadStates(l=jnp.asarray(l), u=jnp.asarray(u), pk=jnp.asarray(pk))
d32 = jnp.asarray(3, I32)

pfill = PCAP // 2
vp = np.full(PCAP, np.iinfo(np.int32).max - (1 << 28), np.int32)
vp[:pfill] = np.sort(rng.integers(0, n0, pfill).astype(np.int32))
psym = np.full(PCAP, 6, np.int8)
psym[:pfill] = rng.integers(0, 6, pfill)
jp = jnp.asarray(psym)
pend0 = PendingIndex(
    vp=jnp.asarray(vp), psym=jp,
    blk_prefix=build_block_tables(jp, KP, dtype=jnp.int32),
    p=jnp.asarray(pfill, jnp.int32),
)


def t_chain(jf, lo=4, hi=16, reps=3):
    np.asarray(jf(lo)); np.asarray(jf(hi))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(jf(lo)); tl = time.time() - t0
        t0 = time.time(); np.asarray(jf(hi)); th = time.time() - t0
        best = min(best, (th - tl) / (hi - lo))
    return best * 1e3


# big device arrays must be jit ARGUMENTS: closure constants are
# serialized into the remote-compile request body (HTTP 413 at 256 MB)
import functools


def argjit(f):
    g = jax.jit(f)
    return lambda r: g(state, rs, jbuf, pend0, r)


# ---- plain round (defer0) at this n ----
@argjit
def plain_round(state, rs, jbuf, pend0, r):
    def body(i, carry):
        st, rd = carry
        st, rd, _ = bcr_round_impl(st, rd, jbuf, d32, False, K=K, so=SO_RLO)
        st = dataclasses.replace(st, n=jnp.minimum(st.n, n0))
        return st, rd
    st, rd = jax.lax.fori_loop(0, r, body, (state, rs))
    return rd.l[0] + st.bwt[0].astype(I32)

print(f"DSPLIT plain_round {t_chain(plain_round):.2f} ms", flush=True)


# ---- deferred inner round: plan(rank_virtual) + pending_add ----
@argjit
def deferred_inner(state, rs, jbuf, pend0, r):
    jb, blkp = state.bwt, state.blk_prefix
    def body(i, carry):
        rd, pend = carry
        rank_fn = lambda g: rank_virtual(jb, blkp, pend, g, K)  # noqa: E731
        new_rd, gX, sym, stream, active, insb, n_ins = plan_round(
            state.psize, state.pcounts, rd, jbuf, d32, False, rank_fn,
            so=SO_RLO)
        pend = pending_add(pend, gX, sym, stream, active)
        pend = PendingIndex(vp=pend0.vp, psym=pend0.psym,
                            blk_prefix=pend.blk_prefix, p=pend0.p)
        new_rd = dataclasses.replace(new_rd, l=jnp.minimum(new_rd.l, n0 // 8))
        return new_rd, pend
    rd, pend = jax.lax.fori_loop(0, r, body, (rs, pend0))
    return rd.l[0] + pend.blk_prefix[0, 0]

print(f"DSPLIT deferred_inner {t_chain(deferred_inner):.2f} ms", flush=True)


# ---- plan with rank_virtual but NO pending_add ----
@argjit
def deferred_norank_add(state, rs, jbuf, pend0, r):
    jb, blkp = state.bwt, state.blk_prefix
    def body(i, rd):
        rank_fn = lambda g: rank_virtual(jb, blkp, pend0, g, K)  # noqa: E731
        new_rd, gX, sym, stream, active, insb, n_ins = plan_round(
            state.psize, state.pcounts, rd, jbuf, d32, False, rank_fn,
            so=SO_RLO)
        new_rd = dataclasses.replace(new_rd, l=jnp.minimum(new_rd.l, n0 // 8))
        return new_rd
    rd = jax.lax.fori_loop(0, r, body, rs)
    return rd.l[0]

print(f"DSPLIT plan+rank_virtual {t_chain(deferred_norank_add):.2f} ms",
      flush=True)


# ---- plan with plain rank (no pending at all) ----
@argjit
def plan_plain_rank(state, rs, jbuf, pend0, r):
    jb, blkp = state.bwt, state.blk_prefix
    def body(i, rd):
        rank_fn = lambda g: rank_global(jb, blkp, g, K)  # noqa: E731
        new_rd, gX, sym, stream, active, insb, n_ins = plan_round(
            state.psize, state.pcounts, rd, jbuf, d32, False, rank_fn,
            so=SO_RLO)
        new_rd = dataclasses.replace(new_rd, l=jnp.minimum(new_rd.l, n0 // 8))
        return new_rd
    rd = jax.lax.fori_loop(0, r, body, rs)
    return rd.l[0]

print(f"DSPLIT plan+plain_rank {t_chain(plan_plain_rank):.2f} ms", flush=True)


# ---- pending_add alone ----
gX0 = jnp.asarray(np.sort(rng.integers(0, n0, M)).astype(np.int32))
sym0 = jnp.asarray(rng.integers(0, 6, M).astype(np.int32))
stream0 = jnp.asarray(np.arange(M, dtype=np.int32))
act0 = jnp.asarray(np.ones(M, bool))


@argjit
def f_add(state, rs, jbuf, pend0, r):
    def body(i, c):
        pd, gX = c
        pd2 = pending_add(pd, gX, sym0, stream0, act0)
        pd3 = PendingIndex(vp=pend0.vp, psym=pend0.psym,
                           blk_prefix=pd2.blk_prefix, p=pend0.p)
        return pd3, jnp.clip(gX + (pd2.vp[0] & 1), 0, n0)
    pd, gX = jax.lax.fori_loop(0, r, body, (pend0, gX0))
    return pd.blk_prefix[0, 0] + gX[0]

print(f"DSPLIT pending_add {t_chain(f_add):.2f} ms", flush=True)


# ---- flush merge at this cap ----
@argjit
def f_flush(state, rs, jbuf, pend0, r):
    def body(i, carry):
        b, g = carry
        nb, nblk = merge_pallas(b, g, sym0, stream0, act0,
                                n=jnp.asarray(n0, jnp.int64), K=K)
        return nb, jnp.clip(g + (nblk[1, 0] & 1), 0, n0)
    b, g = jax.lax.fori_loop(0, r, body, (state.bwt, gX0))
    return b[0].astype(I32) + g[0]

print(f"DSPLIT flush_merge(cap=2^{int(np.log2(CAP))}) "
      f"{t_chain(f_flush, lo=2, hi=8):.2f} ms", flush=True)

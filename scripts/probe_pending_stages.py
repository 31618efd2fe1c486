"""Chain-differenced stage split of pending_add + pending_rank at
sustained shapes (pcap 2^21/2^22, Q = M = 2^17), on the chip.

Stages timed independently (each with a data dependency chain):
  A  searchsorted_blocked(vp, gX)             (the k counts)
  B  hist scatter + cumsum_blocked            (old-row shifts)
  C  the log-shift insertion expand           (17 conditional passes)
  D  build_block_tables(psym, KP)             (pending rank table rebuild)
  E  pending_rank(pend, g)                    (fused descent + occ)
  F  pending_add end to end
Env: PS_PCAP_LOG2 (default 22), PS_M_LOG2 (17).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.pending import (
    KP, PendingIndex, pending_add, pending_rank, searchsorted_blocked,
    _inf,
)
from ropebwt2_tpu.index.rank import build_block_tables
from ropebwt2_tpu.index.scan import cumsum_blocked

PCAP = 1 << int(os.environ.get("PS_PCAP_LOG2", 22))
M = 1 << int(os.environ.get("PS_M_LOG2", 17))
I32 = jnp.int32
dev = jax.devices()[0]
print(f"PSTAGES {dev.device_kind} pcap=2^{PCAP.bit_length()-1} M=2^"
      f"{M.bit_length()-1}", flush=True)

rng = np.random.default_rng(0)
n0 = 1 << 29
pfill = PCAP // 2
vp_np = np.full(PCAP, np.iinfo(np.int32).max - (1 << 28), np.int32)
vp_np[:pfill] = np.sort(rng.integers(0, n0, pfill).astype(np.int32))
psym_np = np.full(PCAP, 6, np.int8)
psym_np[:pfill] = rng.integers(0, 6, pfill)
vp = jnp.asarray(vp_np)
psym = jnp.asarray(psym_np)
pend = PendingIndex(
    vp=vp, psym=psym,
    blk_prefix=build_block_tables(psym, KP, dtype=I32),
    p=jnp.asarray(pfill, I32),
)
gX = jnp.asarray(np.sort(rng.integers(0, n0, M).astype(np.int32)))
sym = jnp.asarray(rng.integers(0, 6, M).astype(np.int32))
stream = jnp.asarray(np.arange(M, dtype=np.int32))
act = jnp.ones(M, bool)


def t_chain(jf, lo=4, hi=16, reps=3):
    np.asarray(jf(lo))
    np.asarray(jf(hi))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(jf(lo)); tl = time.time() - t0
        t0 = time.time(); np.asarray(jf(hi)); th = time.time() - t0
        best = min(best, (th - tl) / (hi - lo))
    return best * 1e3


def argjit(f):
    g = jax.jit(f)
    return lambda r: g(vp, psym, gX, r)


@argjit
def f_search(vp, psym, gX, r):
    def body(i, g):
        k = searchsorted_blocked(vp, g)
        return jnp.clip(g + (k & 1), 0, n0)
    return jax.lax.fori_loop(0, r, body, gX)[0]


@argjit
def f_hist(vp, psym, gX, r):
    def body(i, g):
        hist = jnp.zeros((PCAP,), I32).at[
            jnp.clip(g, 0, PCAP - 1)
        ].add(1, mode="drop")
        s = cumsum_blocked(hist)
        return jnp.clip(g + (s[g[0] & (PCAP - 1)] & 1), 0, n0)
    return jax.lax.fori_loop(0, r, body, gX)[0]


@argjit
def f_expand(vp, psym, gX, r):
    INF = _inf(vp.dtype)
    def body(i, c):
        vo, so_ = c
        cc = cumsum_blocked((so_ != 6).astype(I32))
        nbits = M.bit_length()
        for kk in range(nbits - 1, -1, -1):
            step = 1 << kk
            if step >= PCAP:
                continue
            take = ((cc >> kk) & 1) == 1
            vo = jnp.where(
                take,
                jnp.concatenate([jnp.full((step,), INF, vo.dtype),
                                 vo[:-step]]),
                vo,
            )
            so_ = jnp.where(
                take,
                jnp.concatenate([jnp.full((step,), 6, jnp.int8),
                                 so_[:-step]]),
                so_,
            )
        return vo, so_
    vo, so_ = jax.lax.fori_loop(0, r, body, (vp, psym))
    return vo[0].astype(I32) + so_[0].astype(I32)


@argjit
def f_tables(vp, psym, gX, r):
    def body(i, s):
        t = build_block_tables(
            jnp.where(s[0] > 0, psym, psym), KP, dtype=I32
        )
        return jnp.clip(s + (t[0, 0] & 1), 0, 7)
    return jax.lax.fori_loop(0, r, body, jnp.ones((1,), I32))[0]


def argjit2(f):
    g = jax.jit(f)
    return lambda r: g(pend, gX, r)


@argjit2
def f_rank(pend, gX, r):
    def body(i, g):
        p, occ = pending_rank(pend, g)
        return jnp.clip(g + (p & 1), 0, n0)
    return jax.lax.fori_loop(0, r, body, gX)[0]


@argjit2
def f_add(pend, gX, r):
    def body(i, c):
        pd, g = c
        pd2 = pending_add(pd, g, sym, stream, act)
        pd3 = PendingIndex(vp=pend.vp, psym=pend.psym,
                           blk_prefix=pd2.blk_prefix, p=pend.p)
        return pd3, jnp.clip(g + (pd2.vp[0] & 1), 0, n0)
    pd, g = jax.lax.fori_loop(0, r, body, (pend, gX))
    return pd.blk_prefix[0, 0] + g[0]


for name, f in [("A searchsorted", f_search), ("B hist+cumsum", f_hist),
                ("C expand", f_expand), ("D tables", f_tables),
                ("E pending_rank", f_rank), ("F pending_add", f_add)]:
    print(f"PSTAGES {name}: {t_chain(f):.2f} ms", flush=True)

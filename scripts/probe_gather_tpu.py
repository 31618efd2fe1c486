"""On-chip A/B of rank/descent GATHER strategies at the bench-sustained
regime (n = 2^27 live symbols, Q = 2^17 sorted queries).

Round-4 established the deferred round is gather-bound: plan+plain_rank
8.2-8.7 ms at cap 2^27-2^28 with "all cap-dependence is gather locality"
(HACKING.md).  This probe answers, with chain-differenced in-context
timings (the only trustworthy recipe on the tunneled backend):

  g128i8   (Q,128)-int8 row gather over span n/128 rows   [rank data row]
  g24i32   (Q,24)-int32 row gather over span n/128 rows   [fused-row rank]
  g160i32  (Q,160)-int32 row gather over span p/128 rows  [fused pending]
  rank_int8    current rank_global (table gather + data gather)
  rank_packed  rank_global_packed (two-level tables + nibble rows)
  rank_fused   ONE (Q,24)-int32 gather: 16 nibble-packed lanes + 6 table
               lanes per 128-symbol block, in-row unpack + count
  pend_cur     current pending_rank at pcap 2^20 (4 gathers)
  pend_fused   pending_rank over (pcap/128, 160)-int32 fused rows:
               vp(128) | psym nibbles(16) | blk_prefix(6) | pad -> 2
               gathers total (mid level + final row)

Env: PROBE_NLOG2 (27), PROBE_Q (2^17), PROBE_PCAP (2^20).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.rank import build_block_tables, rank_global
from ropebwt2_tpu.index.packed import (
    build_two_level_tables, pack_bwt_np, rank_global_packed,
)
from ropebwt2_tpu.index.pending import (
    KP, PendingIndex, pending_rank, _inf,
)

I32 = jnp.int32
N = 1 << int(os.environ.get("PROBE_NLOG2", 27))
Q = int(os.environ.get("PROBE_Q", 1 << 17))
PCAP = int(os.environ.get("PROBE_PCAP", 1 << 20))
K = 128
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"GATHER device {dev.platform}:{dev.device_kind} N={N} Q={Q} "
      f"PCAP={PCAP}", flush=True)

bwt = rng.integers(0, 6, N).astype(np.int8)
jb = jnp.asarray(bwt)
blkp = build_block_tables(jb, K, dtype=I32)
pk = pack_bwt_np(bwt)
jpk = jnp.asarray(pk)
blkA, blkB = build_two_level_tables(jpk, N)

# fused rank rows: 16 nibble lanes (int32, 8 syms each) + 6 table + 2 pad
nb = N // 128
pk32 = pk.reshape(nb, 64).view(np.uint32).astype(np.int64)  # (nb,16) 8 nibs
fr = np.zeros((nb, 24), np.int32)
fr[:, :16] = pk32.astype(np.uint32).view(np.int32).reshape(nb, 16)
fr[:, 16:22] = np.asarray(blkp)[:nb]
jfr = jnp.asarray(fr)

# pending state at pcap
pfill = PCAP // 2
vp = np.full(PCAP, np.iinfo(np.int32).max - (1 << 28), np.int32)
vp[:pfill] = np.sort(rng.integers(0, N, pfill).astype(np.int32))
psym = np.full(PCAP, 6, np.int8)
psym[:pfill] = rng.integers(0, 6, pfill)
jpend = PendingIndex(
    vp=jnp.asarray(vp), psym=jnp.asarray(psym),
    blk_prefix=build_block_tables(jnp.asarray(psym), KP, dtype=I32),
    p=jnp.asarray(pfill, I32),
)
# fused pending rows: vp(128) | psym nibbles(16) | pfx(6) | pad -> 160
npb = PCAP // 128
pf = np.zeros((npb, 160), np.int32)
pf[:, :128] = vp.reshape(npb, 128)
psn = (psym.astype(np.uint8) & 0xF)
pf[:, 128:144] = (
    psn.reshape(npb, 64, 2)[:, :, 0] | (psn.reshape(npb, 64, 2)[:, :, 1] << 4)
).astype(np.uint8).reshape(npb, 16, 4).view(np.uint32)[..., 0].view(np.int32)
# ^ byte i of lane k = psym[128k + 8k'...]: little-endian nibble order
#   s_j = (lane >> 4j) & 0xF for j in 0..7
pf[:, 144:150] = np.asarray(jpend.blk_prefix)[:npb]
jpf = jnp.asarray(pf)
# mid descent level for the fused pending (vp block heads)
jmid = jnp.asarray(vp[::128])

q0 = jnp.asarray(np.sort(rng.integers(0, N, Q)).astype(np.int32))


def t_chain(jf, lo=4, hi=16, reps=3):
    np.asarray(jf(lo)); np.asarray(jf(hi))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(jf(lo)); tl = time.time() - t0
        t0 = time.time(); np.asarray(jf(hi)); th = time.time() - t0
        best = min(best, (th - tl) / (hi - lo))
    return best * 1e3


def chain(g, occ0):
    """feed a data-dependent perturbation back into the next query set"""
    return jnp.clip(g + (occ0 & 1), 0, N - 1)


def report(name, ms):
    print(f"GATHER {name} {ms:.3f} ms", flush=True)


# ---- raw gathers ----
def mk_raw(arr2d, name):
    nrows = arr2d.shape[0]

    def f(a, g, r):
        def body(i, g):
            rows = a[jnp.clip(g // 128, 0, nrows - 1)]
            v = rows[:, 0].astype(I32)
            return chain(g, v)
        return jax.lax.fori_loop(0, r, body, g)

    jf = jax.jit(f)
    report(name, t_chain(lambda r: jf(arr2d, q0, r)))


mk_raw(jb.reshape(-1, 128), "g128i8")
mk_raw(jfr, "g24i32")
qp = jnp.asarray(np.sort(rng.integers(0, PCAP * 100, Q)).astype(np.int32))


def f_g160(a, g, r):
    def body(i, g):
        rows = a[jnp.clip(g // 12800, 0, npb - 1)]
        return jnp.clip(g + (rows[:, 0] & 1), 0, PCAP * 100 - 1)
    return jax.lax.fori_loop(0, r, body, g)


report("g160i32", t_chain(lambda r: jax.jit(f_g160)(jpf, qp, r)))


# ---- rank variants ----
def f_rank_int8(b, t, g, r):
    def body(i, g):
        occ = rank_global(b, t, g, K)
        return chain(g, occ[:, 0])
    return jax.lax.fori_loop(0, r, body, g)


report("rank_int8",
       t_chain(lambda r: jax.jit(f_rank_int8)(jb, blkp, q0, r)))


def f_rank_packed(b, A, B, g, r):
    def body(i, g):
        occ = rank_global_packed(b, A, B, g)
        return chain(g, occ[:, 0].astype(I32))
    return jax.lax.fori_loop(0, r, body, g)


pbwt_alloc = jnp.concatenate(
    [jpk, jnp.full((16 * 128,), np.uint8(0x66), jnp.uint8)]
)
report("rank_packed",
       t_chain(lambda r: jax.jit(f_rank_packed)(pbwt_alloc, blkA, blkB,
                                                q0, r)))


def rank_fused(frows, g):
    blk = g // 128
    within = (g % 128).astype(I32)
    rows = frows[blk]  # (Q, 24) int32 — ONE gather
    base = rows[:, 16:22]
    nl = rows[:, :16]
    planes = [((nl >> (4 * j)) & 0xF).astype(jnp.int8) for j in range(8)]
    syms = jnp.stack(planes, axis=2).reshape(-1, 128)  # (Q, 128)
    j = jnp.arange(128, dtype=I32)
    inmask = j[None, :] < within[:, None]
    s6 = jnp.arange(6, dtype=jnp.int8)
    eq = syms[:, :, None] == s6[None, None, :]
    inc = (eq & inmask[:, :, None]).sum(axis=1, dtype=I32)
    return base + inc


def f_rank_fused(fr_, g, r):
    def body(i, g):
        occ = rank_fused(fr_, g)
        return chain(g, occ[:, 0])
    return jax.lax.fori_loop(0, r, body, g)


report("rank_fused", t_chain(lambda r: jax.jit(f_rank_fused)(jfr, q0, r)))


# ---- pending descent variants ----
def f_pend_cur(pend, g, r):
    def body(i, g):
        p, occ = pending_rank(pend, g)
        return chain(g, p + occ[:, 0])
    return jax.lax.fori_loop(0, r, body, g)


report("pend_cur", t_chain(lambda r: jax.jit(f_pend_cur)(jpend, q0, r)))


def pending_rank_fused(pfr, mid, g):
    """descent: broadcast-compare mid heads' heads (tiny), gather mid rows,
    then ONE fused row gather for vp+psym+pfx."""
    gq = g[:, None]
    nmid = mid.shape[0]  # pcap/128
    # level-2: heads of mid (every 128th) — broadcast compare (<=128 wide
    # at pcap 2^20; general case would add one more gather level)
    top = mid[::128]
    cnt = jnp.sum(top[None, :] < gq, axis=1, dtype=I32)
    j = jnp.maximum(cnt - 1, 0)
    rows = mid.reshape(-1, 128)[j]  # (Q,128) gather #1
    c = jnp.sum(rows < gq, axis=1, dtype=I32)
    jb_ = jnp.maximum(j * 128 + c - 1, 0)
    fr_rows = pfr[jb_]  # (Q,160) gather #2
    vrows = fr_rows[:, :128]
    inb = vrows < gq
    cin = jnp.sum(inb, axis=1, dtype=I32)
    zero = mid[0] >= g  # vp[0] >= g  (mid[0] == vp[0])
    p = jnp.where(zero, 0, jb_ * 128 + cin)
    nl = fr_rows[:, 128:144]
    planes = [((nl >> (4 * j2)) & 0xF).astype(jnp.int8) for j2 in range(8)]
    syms = jnp.stack(planes, axis=2).reshape(-1, 128)
    s6 = jnp.arange(6, dtype=jnp.int8)
    eq = (syms[:, :, None] == s6[None, None, :]) & inb[:, :, None]
    occ = fr_rows[:, 144:150] + eq.sum(axis=1, dtype=I32)
    return p, occ


def f_pend_fused(pfr, mid, g, r):
    def body(i, g):
        p, occ = pending_rank_fused(pfr, mid, g)
        return chain(g, p + occ[:, 0])
    return jax.lax.fori_loop(0, r, body, g)


report("pend_fused",
       t_chain(lambda r: jax.jit(f_pend_fused)(jpf, jmid, q0, r)))

# correctness spot-check of the fused variants vs current (same inputs)
occ_a = np.asarray(jax.jit(lambda: rank_global(jb, blkp, q0[:4096], K))())
occ_b = np.asarray(jax.jit(lambda: rank_fused(jfr, q0[:4096]))())
print("GATHER rank_fused parity:", bool((occ_a == occ_b).all()), flush=True)
pa, oa = jax.jit(lambda: pending_rank(jpend, q0[:4096]))()
pb, ob = jax.jit(lambda: pending_rank_fused(jpf, jmid, q0[:4096]))()
print("GATHER pend_fused parity:",
      bool((np.asarray(pa) == np.asarray(pb)).all()
           and (np.asarray(oa) == np.asarray(ob)).all()), flush=True)

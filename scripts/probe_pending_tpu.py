"""Chain-differenced timing of the pending-index primitives on the TPU.

Isolates: (a) jnp.searchsorted (the rank_virtual correction), (b) one
rank_virtual call at rank-phase shapes, (c) one pending_add, (d) pending
block-table rebuild — to find where the 0.44 Msym/s deferred-mode
pathology lives (probe_deferred_tpu round-3 result).

Each primitive runs inside a fori_loop of r iterations in ONE jit dispatch
(per-dispatch tunnel RTT is ~25-100 ms on the axon backend — naive per-call
timing measures RTT, not device time); cost = (t(hi) - t(lo)) / (hi - lo)
with a value dependency threaded between iterations so XLA cannot hoist the
body out of the loop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ropebwt2_tpu.index.pending import (
        KP, PendingIndex, pending_add, rank_virtual,
    )
    from ropebwt2_tpu.index.rank import build_block_tables, rank_global

    dev = jax.devices()[0]
    print(f"[pend] device {dev.platform}:{dev.device_kind}", flush=True)

    PCAP = int(os.environ.get("PROBE_PCAP", 1 << 21))
    M = 1 << 17
    Q = 1 << 18
    CAP = 1 << 27
    NV = 100_000_000
    K = 128
    rng = np.random.default_rng(0)

    pfill = PCAP // 2
    vp = np.full(PCAP, np.iinfo(np.int32).max - (1 << 28), np.int32)
    vp[:pfill] = np.sort(rng.integers(0, NV, pfill).astype(np.int32))
    psym = np.full(PCAP, 6, np.int8)
    psym[:pfill] = rng.integers(0, 6, pfill)
    jp = jnp.asarray(psym)
    pend = PendingIndex(
        vp=jnp.asarray(vp),
        psym=jp,
        blk_prefix=build_block_tables(jp, KP, dtype=jnp.int32),
        p=jnp.asarray(pfill, jnp.int32),
    )
    bwt = jnp.asarray(rng.integers(0, 6, CAP).astype(np.int8))
    blk = build_block_tables(bwt, K, dtype=jnp.int32)
    g0 = jnp.asarray(np.sort(rng.integers(0, NV, Q)).astype(np.int32))

    def t_chain(jf, lo=4, hi=20, reps=3):
        np.asarray(jf(lo))
        np.asarray(jf(hi))
        best = 1e9
        for _ in range(reps):
            t0 = time.time(); np.asarray(jf(lo)); tl = time.time() - t0
            t0 = time.time(); np.asarray(jf(hi)); th = time.time() - t0
            best = min(best, (th - tl) / (hi - lo))
        return best * 1e3

    from ropebwt2_tpu.index.pending import searchsorted_blocked

    @jax.jit
    def f_ssb(r):
        def body(i, g):
            p = searchsorted_blocked(pend.vp, g)
            return jnp.clip(g + (p & 1), 0, NV)
        g = jax.lax.fori_loop(0, r, body, g0)
        return g[0]

    print(f"[pend] searchsorted_blocked vp[2^21] q[2^18]: "
          f"{t_chain(f_ssb):.3f} ms", flush=True)

    @jax.jit
    def f_rank(r):
        def body(i, g):
            occ = rank_global(bwt, blk, g, K)
            return jnp.clip(g + (occ[:, 0] & 1), 0, CAP - 1)
        g = jax.lax.fori_loop(0, r, body, g0)
        return g[0]

    print(f"[pend] rank_global q[2^18] K=128: {t_chain(f_rank):.3f} ms",
          flush=True)

    @jax.jit
    def f_rv(r):
        def body(i, g):
            occ = rank_virtual(bwt, blk, pend, g, K)
            return jnp.clip(g + (occ[:, 0] & 1), 0, NV)
        g = jax.lax.fori_loop(0, r, body, g0)
        return g[0]

    print(f"[pend] rank_virtual q[2^18]: {t_chain(f_rv):.3f} ms", flush=True)

    gX0 = jnp.asarray(np.sort(rng.integers(0, NV, M)).astype(np.int32))
    sym0 = jnp.asarray(rng.integers(0, 6, M).astype(np.int32))
    stream0 = jnp.asarray(np.arange(M, dtype=np.int32))
    act0 = jnp.asarray(np.ones(M, bool))

    @jax.jit
    def f_add(r):
        def body(i, c):
            pd, gX = c
            pd2 = pending_add(pd, gX, sym0, stream0, act0)
            # keep p bounded: reuse the ORIGINAL pending rows, vary gX
            pd3 = PendingIndex(vp=pend.vp, psym=pend.psym,
                               blk_prefix=pd2.blk_prefix, p=pend.p)
            return pd3, jnp.clip(gX + (pd2.vp[0] & 1), 0, NV)
        pd, gX = jax.lax.fori_loop(0, r, body, (pend, gX0))
        return pd.blk_prefix[0, 0] + gX[0]

    print(f"[pend] pending_add M=2^17: {t_chain(f_add):.3f} ms", flush=True)

    from ropebwt2_tpu.index.scan import cumsum_blocked

    @jax.jit
    def f_hist(r):
        def body(i, k):
            hist = jnp.zeros((PCAP,), jnp.int32).at[k].add(1, mode="drop")
            return jnp.clip(k + (hist[0] & 1), 0, PCAP - 1)
        k = jax.lax.fori_loop(0, r, body, gX0 % PCAP)
        return k[0]

    print(f"[pend] hist scatter-add M->2^21: {t_chain(f_hist):.3f} ms",
          flush=True)

    @jax.jit
    def f_cs(r):
        def body(i, x):
            c = cumsum_blocked(x)
            return x ^ (c[-1] & 1)
        x = jax.lax.fori_loop(0, r, body, jnp.ones((PCAP,), jnp.int32))
        return x[0]

    print(f"[pend] cumsum_blocked 2^21: {t_chain(f_cs):.3f} ms", flush=True)

    @jax.jit
    def f_scat(r):
        iota = jnp.arange(PCAP, dtype=jnp.int32)
        def body(i, c):
            v, sl = c
            out = jnp.zeros((PCAP,), jnp.int32).at[sl].set(
                v, mode="drop", unique_indices=True
            )
            return out, jnp.clip(sl + (out[0] & 1), 0, PCAP - 1)
        v, sl = jax.lax.fori_loop(
            0, r, body, (jnp.ones((PCAP,), jnp.int32), iota)
        )
        return v[0]

    print(f"[pend] full-width scatter 2^21->2^21: {t_chain(f_scat):.3f} ms",
          flush=True)

    @jax.jit
    def f_tbl(r):
        def body(i, c):
            s, acc = c
            t = build_block_tables(s, KP, dtype=jnp.int32)
            s2 = jnp.where(
                jnp.arange(s.shape[0]) == (t[0, 0] & 127),
                (i % 6).astype(jnp.int8), s,
            )
            return s2, acc + t[1, 0]
        s, acc = jax.lax.fori_loop(0, r, body, (jp, jnp.zeros((), jnp.int32)))
        return acc

    print(f"[pend] build_block_tables 2^21: {t_chain(f_tbl):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()

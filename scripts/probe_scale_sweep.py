"""On-chip (M, R) sweep for the Gsym sustained regime (round-4 task 1).

Times full insert_multi batches (host pack + transfer + all rounds + sync)
of M random 101 bp reads against a ~0.9 Gsym index at capacity 2^30 —
the END regime of the 1.07 Gsym SCALE run — for a grid of batch sizes M
and defer depths R.  Prints compile wall and per-batch walls per config.

The prefill state is FABRICATED on device (uniform random symbols +
consistent psize/pcounts/blk_prefix): rank/plan/merge timing depends only
on the state's statistical shape (position spread, table sizes), not on
BWT validity, and fabrication takes seconds where a real prefill takes
minutes.  The winning config is then validated by the real SCALE run
(md5 vs the reference).

Env: SWEEP_N (prefill symbols, default 900e6), SWEEP_CONFIGS
("M:R,M:R,..." as log2M:R, default "17:8,17:16,17:32,17:64,18:8,18:16,18:32"),
SWEEP_BATCHES (timed batches per config, default 2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fabricate_state(cap, n0, n_sent, K):
    """A FlatBwt at capacity ``cap`` with n0 live symbols of uniform random
    content and self-consistent counts (NOT a valid BWT — timing only).
    The device work is ONE jitted call: on the tunneled backend every eager
    op is a separate remote compile + RTT."""
    import functools
    import jax
    import jax.numpy as jnp
    from ropebwt2_tpu.index.flat import FlatBwt, PAD, PAD_TAIL, table_dtype
    from ropebwt2_tpu.index.scan import cumsum_blocked

    tdt = table_dtype(cap)

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
    def fab(cap, n0, n_sent, K):
        key = jax.random.PRNGKey(7)
        bwt = jax.random.randint(
            key, (cap + PAD_TAIL,), 1, 5, dtype=jnp.int8
        )
        iota = jnp.arange(cap + PAD_TAIL, dtype=jnp.int32)
        step = max(n0 // max(n_sent, 1), 1)
        bwt = jnp.where((iota % step) == 0, jnp.int8(0), bwt)
        bwt = jnp.where(iota < n0, bwt, jnp.int8(PAD))
        nb = (cap + PAD_TAIL) // K
        blocks = bwt.reshape(nb, K)
        cnts = []
        for s in range(6):
            cnts.append((blocks == s).sum(axis=1, dtype=jnp.int32))
        cnt = jnp.stack(cnts, axis=1)
        blk_prefix = jnp.concatenate(
            [jnp.zeros((1, 6), tdt), cumsum_blocked(cnt.astype(tdt))]
        )
        return bwt, blk_prefix, blk_prefix[nb]

    bwt, blk_prefix, totals = fab(cap, n0, n_sent, K)
    # partition sizes proportional to plausible next-symbol shares; exact
    # values only shape position arithmetic, not cost
    psize = np.zeros(6, np.int64)
    tot = np.asarray(totals, np.int64)
    psize[0] = n_sent
    body = n0 - n_sent
    for b in range(1, 6):
        psize[b] = body // 5
    psize[5] = n0 - psize[:5].sum()
    # pcounts rows summing to psize with the global per-symbol totals
    pc = np.zeros((6, 6), np.int64)
    for b in range(6):
        row = (tot * (psize[b] / max(n0, 1))).astype(np.int64)
        drift = psize[b] - row.sum()
        row[1] += drift
        pc[b] = row
    return FlatBwt(
        bwt=bwt,
        n=jnp.asarray(n0, jnp.int64),
        psize=jnp.asarray(psize),
        pcounts=jnp.asarray(pc),
        blk_prefix=blk_prefix,
    )


def main():
    import jax
    import jax.numpy as jnp
    from ropebwt2_tpu.engine import TpuBwt

    cap = 1 << 30
    L = 101
    n0 = int(float(os.environ.get("SWEEP_N", 9e8)))
    n_sent = n0 // (L + 1)
    nbat = int(os.environ.get("SWEEP_BATCHES", 2))
    cfgs = os.environ.get(
        "SWEEP_CONFIGS", "17:8,17:16,17:32,17:64,18:8,18:16,18:32"
    )
    dev = jax.devices()[0]
    print(f"[sweep] device {dev.platform}:{dev.device_kind}, cap 2^30, "
          f"prefill {n0/1e9:.2f} Gsym (fabricated)", flush=True)

    t0 = time.time()
    K = int(os.environ.get("SWEEP_K", 128))
    state0 = fabricate_state(cap, n0, n_sent, K=K)
    jax.block_until_ready(state0.blk_prefix)
    _ = np.asarray(state0.psize)  # true sync (tunnel backend)
    print(f"[sweep] fabricate {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(99)
    results = []
    for tok in cfgs.split(","):
        lm, r = tok.split(":")
        M, R = 1 << int(lm), int(r)
        eng = TpuBwt(so=1, K=K, defer_r=R)
        eng.state = jax.tree.map(jnp.copy, state0)
        jax.block_until_ready(eng.state.bwt)
        eng._n = n0
        eng._n_strings = n_sent
        reads = rng.integers(1, 5, size=(M, L), dtype=np.uint8).view(np.int8)

        tc = time.time()
        eng.insert_multi(reads)
        _ = eng.counts()
        compile_wall = time.time() - tc

        walls = []
        for _b in range(nbat):
            reads = rng.integers(1, 5, size=(M, L), dtype=np.uint8).view(np.int8)
            tb = time.time()
            eng.insert_multi(reads)
            _ = eng.counts()
            walls.append(time.time() - tb)
        thr = M * (L + 1) / min(walls) / 1e6
        print(f"[sweep] M=2^{lm} R={R:>2}: compile+1st {compile_wall:6.1f}s "
              f"walls {['%.2f' % w for w in walls]} -> {thr:6.2f} Msym/s",
              flush=True)
        results.append((M, R, thr))
        del eng

    results.sort(key=lambda x: -x[2])
    print("[sweep] ranking:", [(f"2^{int(np.log2(m))}", r, round(t, 2))
                               for m, r, t in results], flush=True)


if __name__ == "__main__":
    main()

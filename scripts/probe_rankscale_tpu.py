"""How does the rank phase scale with index size, block size K, and batch
M?  Times plan+plain_rank (the deferred-mode floor) and a bare rank_global
across a (cap, K, M) grid in ONE process — chained fori_loops, differenced.

Env: GRID="caplog:K:Mlog,..." (default covers cap 2^24/2^28, K 128/256/512,
M 2^17/2^19).
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import I32, ReadStates, plan_round
from ropebwt2_tpu.index.flat import FlatBwt, PAD_TAIL
from ropebwt2_tpu.index.rank import build_block_tables, rank_global
from ropebwt2_tpu.oracle import SO_RLO

L = 101
dev = jax.devices()[0]
print(f"RANKSCALE device {dev.platform}:{dev.device_kind}", flush=True)


def t_chain(jf, args, lo=4, hi=16, reps=3):
    np.asarray(jf(*args, lo)); np.asarray(jf(*args, hi))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(jf(*args, lo)); tl = time.time() - t0
        t0 = time.time(); np.asarray(jf(*args, hi)); th = time.time() - t0
        best = min(best, (th - tl) / (hi - lo))
    return best * 1e3


def run_cfg(caplog, K, mlog):
    CAP = 1 << caplog
    M = 1 << mlog
    rng = np.random.default_rng(0)
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
    Q = 2 * M
    g0 = jnp.asarray(np.sort(rng.integers(0, n0, Q)).astype(np.int32))

    @jax.jit
    def plan_rank(state, rs, jbuf, r):
        jbv, blkv = state.bwt, state.blk_prefix

        def body(i, rd):
            rank_fn = lambda g: rank_global(jbv, blkv, g, K)  # noqa: E731
            new_rd, *_ = plan_round(
                state.psize, state.pcounts, rd, jbuf, d32, False, rank_fn,
                so=SO_RLO)
            return dataclasses.replace(
                new_rd, l=jnp.minimum(new_rd.l, n0 // 8))
        rd = jax.lax.fori_loop(0, r, body, rs)
        return rd.l[0]

    @jax.jit
    def bare_rank(state, g00, r):
        jbv, blkv = state.bwt, state.blk_prefix

        def body(i, g):
            occ = rank_global(jbv, blkv, g, K)
            return jnp.clip(g + (occ[:, 0] & 1), 0, n0 - 1)
        g = jax.lax.fori_loop(0, r, body, g00)
        return g[0]

    t_pr = t_chain(lambda s, a, b, r: plan_rank(s, a, b, r),
                   (state, rs, jbuf))
    t_r = t_chain(lambda s, g, r: bare_rank(s, g, r), (state, g0))
    per = t_pr * 1e6 / M
    print(f"RANKSCALE cap=2^{caplog} K={K} M=2^{mlog}: "
          f"plan+rank {t_pr:.2f} ms ({per:.0f} ns/sym) | "
          f"bare rank(Q={Q}) {t_r:.2f} ms", flush=True)
    del state, jb, blkp


def main():
    grid = os.environ.get(
        "GRID",
        "24:128:17,28:128:17,28:256:17,28:512:17,28:128:19,28:256:19",
    )
    for part in grid.split(","):
        caplog, K, mlog = (int(x) for x in part.split(":"))
        run_cfg(caplog, K, mlog)


if __name__ == "__main__":
    main()

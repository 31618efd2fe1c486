"""Is the plan phase really cap-dependent?  plan_round with a STUB rank_fn
(no table/buffer access) at cap 2^24 vs 2^28 — if stub-plan times match,
the plan+rank growth with cap lives entirely in the rank gathers."""
import sys
import time
import dataclasses

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import I32, ReadStates, plan_round
from ropebwt2_tpu.index.flat import FlatBwt, PAD_TAIL
from ropebwt2_tpu.index.rank import build_block_tables
from ropebwt2_tpu.oracle import SO_RLO

M = 1 << 17
L = 101
dev = jax.devices()[0]
print(f"PLANSTUB device {dev.platform}:{dev.device_kind} M={M}", flush=True)


def t_chain(jf, args, lo=4, hi=16, reps=3):
    np.asarray(jf(*args, lo)); np.asarray(jf(*args, hi))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(jf(*args, lo)); tl = time.time() - t0
        t0 = time.time(); np.asarray(jf(*args, hi)); th = time.time() - t0
        best = min(best, (th - tl) / (hi - lo))
    return best * 1e3


def stub_rank(gpos):
    return (
        gpos[:, None] // 64 + jnp.arange(6, dtype=I32)[None, :]
    ).astype(I32) % 7


for caplog in (24, 28):
    CAP = 1 << caplog
    rng = np.random.default_rng(0)
    n0 = CAP // 2
    psize = np.full(6, n0 // 6, np.int64); psize[5] = n0 - psize[:5].sum()
    pc = np.zeros((6, 6), np.int64)
    for b in range(6):
        pc[b, :] = psize[b] // 6
        pc[b, 5] = psize[b] - pc[b, :5].sum()
    jpsize, jpc = jnp.asarray(psize), jnp.asarray(pc)
    STRIDE = 104
    buf = np.zeros(M * STRIDE, np.int8)
    buf.reshape(M, STRIDE)[:, :L] = rng.integers(1, 5, (M, L))[:, ::-1]
    jbuf = jnp.asarray(buf)
    pk = (np.arange(M, dtype=np.int32) * STRIDE) | rng.integers(
        1, 5, M).astype(np.int32)
    l = np.sort(rng.integers(0, n0 // 8, M)).astype(np.int32)
    u = (l + rng.integers(0, 3, M)).astype(np.int32)
    rs = ReadStates(l=jnp.asarray(l), u=jnp.asarray(u), pk=jnp.asarray(pk))
    d32 = jnp.asarray(3, I32)

    @jax.jit
    def plan_stub(jpsize, jpc, rs, jbuf, r):
        def body(i, rd):
            new_rd, *_ = plan_round(
                jpsize, jpc, rd, jbuf, d32, False, stub_rank, so=SO_RLO)
            return dataclasses.replace(
                new_rd, l=jnp.minimum(new_rd.l, n0 // 8))
        rd = jax.lax.fori_loop(0, r, body, rs)
        return rd.l[0]

    t = t_chain(lambda a, b, c, dd, r: plan_stub(a, b, c, dd, r),
                (jpsize, jpc, rs, jbuf))
    print(f"PLANSTUB cap=2^{caplog}: plan(stub rank) {t:.2f} ms", flush=True)

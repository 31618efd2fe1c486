"""Decompose bare rank cost at cap 2^28, Q=2^18: full rank vs data-gather
only (no table row) vs table-row only (no data gather) vs compare-only.
Decides whether fusing the (Q,6) table row into the 128-symbol data row
(one padded gather) is worth the layout surgery."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.flat import PAD_TAIL
from ropebwt2_tpu.index.rank import build_block_tables

CAP = 1 << 28
K = 128
Q = 1 << 18
NSYM = 6
rng = np.random.default_rng(0)
n0 = CAP // 2
bwt = np.full(CAP + PAD_TAIL, 6, np.int8)
bwt[:n0] = rng.integers(0, 6, n0)
jb = jnp.asarray(bwt)
blkp = build_block_tables(jb, K, dtype=jnp.int32)
g0 = jnp.asarray(np.sort(rng.integers(0, n0, Q)).astype(np.int32))
dev = jax.devices()[0]
print(f"RANKPARTS device {dev.platform}:{dev.device_kind}", flush=True)


def t_chain(jf, args, lo=4, hi=24, reps=3):
    np.asarray(jf(*args, lo)); np.asarray(jf(*args, hi))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(jf(*args, lo)); tl = time.time() - t0
        t0 = time.time(); np.asarray(jf(*args, hi)); th = time.time() - t0
        best = min(best, (th - tl) / (hi - lo))
    return best * 1e3


def loop(body):
    @jax.jit
    def f(jbv, blkv, g00, r):
        def it(i, g):
            occ = body(jbv, blkv, g)
            return jnp.clip(g + (occ & 1), 0, n0 - 1)
        return jax.lax.fori_loop(0, r, it, g00)[0]
    return lambda *a: f(*a)


def full(jbv, blkv, g):
    blk = g // K
    within = (g % K).astype(jnp.int32)
    base = blkv[blk]
    data = jbv.reshape(-1, K)[jnp.clip(blk, 0, jbv.shape[0] // K - 1)]
    j = jnp.arange(K, dtype=jnp.int32)
    inmask = j[None, :] < within[:, None]
    sym = jnp.arange(NSYM, dtype=jnp.int8)
    eq = data[:, :, None] == sym[None, None, :]
    inc = (eq & inmask[:, :, None]).sum(axis=1, dtype=jnp.int32)
    return (base + inc)[:, 0]


def data_only(jbv, blkv, g):
    blk = g // K
    within = (g % K).astype(jnp.int32)
    data = jbv.reshape(-1, K)[jnp.clip(blk, 0, jbv.shape[0] // K - 1)]
    j = jnp.arange(K, dtype=jnp.int32)
    inmask = j[None, :] < within[:, None]
    sym = jnp.arange(NSYM, dtype=jnp.int8)
    eq = data[:, :, None] == sym[None, None, :]
    inc = (eq & inmask[:, :, None]).sum(axis=1, dtype=jnp.int32)
    return inc[:, 0]


def table_only(jbv, blkv, g):
    blk = g // K
    return blkv[blk][:, 0] + (g % K).astype(jnp.int32)


def compare_only(jbv, blkv, g):
    within = (g % K).astype(jnp.int32)
    data = jbv.reshape(-1, K)[: Q]  # static slice, no gather
    j = jnp.arange(K, dtype=jnp.int32)
    inmask = j[None, :] < within[:, None]
    sym = jnp.arange(NSYM, dtype=jnp.int8)
    eq = data[:, :, None] == sym[None, None, :]
    inc = (eq & inmask[:, :, None]).sum(axis=1, dtype=jnp.int32)
    return inc[:, 0]


for name, body in (("full", full), ("data_only", data_only),
                   ("table_only", table_only),
                   ("compare_only(no gather)", compare_only)):
    t = t_chain(loop(body), (jb, blkp, g0))
    print(f"RANKPARTS {name}: {t:.3f} ms", flush=True)

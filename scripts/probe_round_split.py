"""Fresh per-phase split of one BCR round at the bench config (K=128,
M=2^17, n ~ 2^23).  Chained fori_loops, differenced chain lengths, tiny
fetches — the only trustworthy timing recipe on the tunneled backend.

Phases: full round | plan(stub rank) | rank2q | rank sub-costs (base gather,
data gather, eq+sum) | merge-in-context.
Env: PROBE_M, PROBE_K.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import ReadStates, bcr_round_impl, plan_round, I32
from ropebwt2_tpu.index.flat import FlatBwt, PAD_TAIL
from ropebwt2_tpu.index.rank import build_block_tables, rank_global
from ropebwt2_tpu.index.merge_pallas import merge_pallas
from ropebwt2_tpu.oracle import SO_RLO

M = int(os.environ.get("PROBE_M", 1 << 17))
L = 101
CAP = 1 << 24
K = int(os.environ.get("PROBE_K", 128))
NSYM = 6
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"SPLIT device {dev.platform}:{dev.device_kind} M={M} K={K}", flush=True)

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

qpos = jnp.asarray(np.sort(rng.integers(0, n0, 2 * M)).astype(np.int32))


def t_chain(jf, lo=8, hi=40, reps=3):
    np.asarray(jf(lo)); np.asarray(jf(hi))  # compile both
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); np.asarray(jf(lo)); tl = time.time() - t0
        t0 = time.time(); np.asarray(jf(hi)); th = time.time() - t0
        best = min(best, (th - tl) / (hi - lo))
    return best * 1e3


# ---- full round ----
@jax.jit
def full_round(r):
    def body(i, carry):
        st, rd = carry
        st, rd, _ = bcr_round_impl(st, rd, jbuf, d32, False, K=K, so=SO_RLO)
        st = dataclasses.replace(st, n=jnp.minimum(st.n, n0))
        return st, rd
    st, rd = jax.lax.fori_loop(0, r, body, (state, rs))
    return rd.l[0] + st.bwt[0].astype(I32)

print(f"SPLIT full_round {t_chain(full_round):.2f} ms", flush=True)


# ---- plan with stub rank (cost of everything but rank lookups) ----
def stub_rank(gpos):
    q = gpos.shape[0]
    return (gpos[:, None] // 64 + jnp.arange(6, dtype=I32)[None, :]).astype(I32) % 7


@jax.jit
def plan_stub(r):
    def body(i, rd):
        rd, gX, sym, stream, active, insb, n_ins = plan_round(
            state.psize, state.pcounts, rd, jbuf, d32, False, stub_rank,
            so=SO_RLO)
        rd = dataclasses.replace(rd, l=jnp.minimum(rd.l, n0 // 8))
        return rd
    rd = jax.lax.fori_loop(0, r, body, rs)
    return rd.l[0]

print(f"SPLIT plan_norank {t_chain(plan_stub):.2f} ms", flush=True)


# ---- rank: full, and sub-costs ----
@jax.jit
def rank_full(r):
    def body(i, p):
        out = rank_global(jb, blkp, p, K)
        return (p + out[0, 0]) % n0
    return jax.lax.fori_loop(0, r, body, qpos)[0]

print(f"SPLIT rank2q {t_chain(rank_full):.2f} ms", flush=True)


@jax.jit
def rank_base_gather(r):
    def body(i, p):
        base = blkp[p // K]
        return (p + base[0, 0]) % n0
    return jax.lax.fori_loop(0, r, body, qpos)[0]

print(f"SPLIT rank_base_gather {t_chain(rank_base_gather):.2f} ms", flush=True)


@jax.jit
def rank_data_gather(r):
    b2 = jb.reshape(-1, K)
    def body(i, p):
        rows = b2[jnp.clip(p // K, 0, b2.shape[0] - 1)]
        return (p + rows[0, 0].astype(I32)) % n0
    return jax.lax.fori_loop(0, r, body, qpos)[0]

print(f"SPLIT rank_data_gather {t_chain(rank_data_gather):.2f} ms", flush=True)


@jax.jit
def rank_eqsum(r):
    rows0 = jb.reshape(-1, K)[jnp.clip(qpos // K, 0, CAP // K - 1)]
    def body(i, carry):
        p, acc = carry
        within = (p % K).astype(I32)
        jx = jnp.arange(K, dtype=I32)
        inmask = jx[None, :] < within[:, None]
        sym = jnp.arange(NSYM, dtype=jnp.int8)
        eq = rows0[:, :, None] == sym[None, None, :]
        inc = (eq & inmask[:, :, None]).sum(axis=1, dtype=I32)
        return (p + inc[0, 0]) % n0, acc + inc[0, 1]
    out = jax.lax.fori_loop(0, r, body, (qpos, jnp.asarray(0, I32)))
    return out[1]

print(f"SPLIT rank_eqsum {t_chain(rank_eqsum):.2f} ms", flush=True)


# ---- merge in context ----
pos0 = jnp.asarray(np.sort(rng.integers(0, n0, M)).astype(np.int32))
sym0 = jnp.asarray(rng.integers(0, 6, M).astype(np.int32))
str0 = jnp.asarray(np.arange(M, dtype=np.int32))
valid = jnp.ones(M, bool)
jn = jnp.asarray(n0, jnp.int64)


@jax.jit
def merge_ctx(r):
    def body(i, carry):
        b, p = carry
        nb2, blkp2 = merge_pallas(b, p, sym0, str0, valid, n=jn, K=K)
        return nb2, (p + blkp2[1, 0]) % n0
    b, p = jax.lax.fori_loop(0, r, body, (jb, pos0))
    return p[0]

print(f"SPLIT merge_full {t_chain(merge_ctx):.2f} ms", flush=True)

"""On-TPU phase timings: full round vs plan vs rank, chained in one jit.

Fewer compiles than per-op probes (the remote compile service is the
bottleneck).  Prints PHASE lines in ms/round."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import (
    ReadStates, plan_round, bcr_round_impl, I32)
from ropebwt2_tpu.index.flat import empty_state, grow_state, PAD_TAIL
from ropebwt2_tpu.index.rank import rank_global, build_block_tables
from ropebwt2_tpu.oracle import SO_RLO

M = int(os.environ.get("PROBE_M", 1 << 17))
L = 101
CAP = 1 << 24
K = 256
R = int(os.environ.get("PROBE_R", 20))
rng = np.random.default_rng(0)

dev = jax.devices()[0]
print(f"PHASE device {dev.platform}:{dev.device_kind} M={M}", flush=True)

# mid-build state: n ~ CAP/2 random content
n0 = CAP // 2
bwt = np.full(CAP + PAD_TAIL, 6, np.int8)
bwt[:n0] = rng.integers(0, 6, n0)
jb = jnp.asarray(bwt)
blkp = build_block_tables(jb, K, dtype=jnp.int32)
import dataclasses
from ropebwt2_tpu.index.flat import FlatBwt
psize = np.zeros(6, np.int64); psize[:] = n0 // 6; psize[0] += n0 - psize.sum() + psize[0] * 0
psize = np.maximum(psize, 0); psize[5] = n0 - psize[:5].sum()
pc = np.zeros((6, 6), np.int64)
for b in range(6):
    pc[b, :] = psize[b] // 6
    pc[b, 5] = psize[b] - pc[b, :5].sum()
state = FlatBwt(bwt=jb, n=jnp.asarray(n0, jnp.int64),
                psize=jnp.asarray(psize), pcounts=jnp.asarray(pc),
                blk_prefix=blkp)

buf = np.zeros(M * (L + 1), np.int8)
reads_mat = rng.integers(1, 5, (M, L)).astype(np.int8)
buf_view = buf.reshape(M, L + 1)
buf_view[:, :L] = reads_mat[:, ::-1]
jbuf = jnp.asarray(buf)
off = (np.arange(M, dtype=np.int32) * (L + 1)).astype(np.int32)
slen = np.full(M, L, np.int32)
l = np.sort(rng.integers(0, n0 // 8, M)).astype(np.int32)
u = (l + rng.integers(0, 3, M)).astype(np.int32)
c = np.sort(rng.integers(0, 6, M)).astype(np.int32)
rs = ReadStates(l=jnp.asarray(l), u=jnp.asarray(u), c=jnp.asarray(c),
                off=jnp.asarray(off), slen=jnp.asarray(slen))

def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

def timeit(name, jf, *args):
    out = jf(*args); fetch(out)
    t0 = time.time(); out = jf(*args); fetch(out)
    dt = (time.time() - t0) / R
    print(f"PHASE {name} {dt*1e3:.2f} ms", flush=True)

d32 = jnp.asarray(3, I32)

@jax.jit
def full_round_chain(st, rd):
    def body(i, carry):
        st, rd = carry
        st, rd, _ = bcr_round_impl(st, rd, jbuf, d32, False, K=K, so=SO_RLO)
        # clamp n back so the state shape/work stays comparable
        st = dataclasses.replace(st, n=jnp.minimum(st.n, n0))
        return st, rd
    return jax.lax.fori_loop(0, R, body, (st, rd))

@jax.jit
def plan_chain(st, rd):
    def body(i, rd):
        rank_fn = lambda g: rank_global(st.bwt, st.blk_prefix, g, K)
        new_rd, gX, sym, stream, active, insb, n_ins = plan_round(
            st.psize, st.pcounts, rd, jbuf, d32, False, rank_fn, so=SO_RLO)
        # keep read state bounded: reuse original l/u, rotate c
        return dataclasses.replace(rd, c=new_rd.c)
    return jax.lax.fori_loop(0, R, body, rd)

@jax.jit
def rank_chain(st, q):
    def body(i, q):
        r = rank_global(st.bwt, st.blk_prefix, (q + i) % (CAP - 1), K)
        return q + (r[:, 0] & 1)
    return jax.lax.fori_loop(0, R, body, q)

q0 = jnp.asarray(np.sort(rng.integers(0, n0, M)).astype(np.int32))
timeit("rank1q", rank_chain, state, q0)
timeit("plan", plan_chain, state, rs)
timeit("full_round", full_round_chain, state, rs)

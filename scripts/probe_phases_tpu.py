"""On-TPU full-round timing: chained rounds, tiny scalar fetch, two chain
lengths differenced to cancel dispatch RTT and transfer costs."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import ReadStates, bcr_round_impl, I32
from ropebwt2_tpu.index.flat import FlatBwt, PAD_TAIL
from ropebwt2_tpu.index.rank import build_block_tables
from ropebwt2_tpu.oracle import SO_RLO

M = int(os.environ.get("PROBE_M", 1 << 17))
L = 101
CAP = 1 << 24
K = int(os.environ.get("PROBE_K", 256))
rng = np.random.default_rng(0)

dev = jax.devices()[0]
print(f"PHASE device {dev.platform}:{dev.device_kind} M={M}", flush=True)

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

@jax.jit
def full_round_chain(st, rd, r):
    def body(i, carry):
        st, rd = carry
        st, rd, _ = bcr_round_impl(st, rd, jbuf, d32, False, K=K, so=SO_RLO)
        st = dataclasses.replace(st, n=jnp.minimum(st.n, n0))
        return st, rd
    st, rd = jax.lax.fori_loop(0, r, body, (st, rd))
    return rd.l[0] + st.bwt[0].astype(I32)  # tiny fetch

def t_of(R, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        np.asarray(full_round_chain(state, rs, R))
        best = min(best, time.time() - t0)
    return best

np.asarray(full_round_chain(state, rs, 1))  # compile
RLO_, RHI = 8, 40
per = (t_of(RHI) - t_of(RLO_)) / (RHI - RLO_)
print(f"PHASE full_round {per*1e3:.2f} ms", flush=True)

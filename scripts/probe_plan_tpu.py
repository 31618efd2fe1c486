"""True plan-phase cost on TPU: all outputs folded into the carry, tiny
scalar fetches, two chain lengths differenced to cancel RTT/transfer."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import ReadStates, plan_round, I32
from ropebwt2_tpu.index.flat import FlatBwt, PAD_TAIL
from ropebwt2_tpu.index.rank import rank_global, build_block_tables
from ropebwt2_tpu.oracle import SO_RLO

M = 1 << 17
L = 101
CAP = 1 << 24
K = int(os.environ.get("PROBE_K", 256))
rng = np.random.default_rng(0)

dev = jax.devices()[0]
print(f"PLAN device {dev.platform}:{dev.device_kind} M={M}", flush=True)

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

STRIDE = 104  # 8-aligned stride for 101+NUL
buf = np.zeros(M * STRIDE, np.int8)
buf.reshape(M, STRIDE)[:, :L] = rng.integers(1, 5, (M, L))[:, ::-1]
jbuf = jnp.asarray(buf)
pk = (np.arange(M, dtype=np.int32) * STRIDE) | rng.integers(1, 5, M).astype(np.int32)
l = np.sort(rng.integers(0, n0 // 8, M)).astype(np.int32)
u = (l + rng.integers(0, 3, M)).astype(np.int32)
rs = ReadStates(l=jnp.asarray(l), u=jnp.asarray(u), pk=jnp.asarray(pk))

d32 = jnp.asarray(3, I32)
wrap = lambda x: jnp.clip(x, 0, n0 - 1).astype(rs.l.dtype)

def mk_chain(rank_mode):
    @jax.jit
    def chain(rd, r):
        def body(i, rd):
            if rank_mode == "real":
                rank_fn = lambda g: rank_global(state.bwt, state.blk_prefix,
                                                jnp.clip(g, 0, n0), K)
            else:
                rank_fn = lambda g: (
                    jnp.zeros((M, 6), I32) + g[:, None].astype(I32) // 64
                )
            new_rd, gX, sym, stream, active, insb, n_ins = plan_round(
                state.psize, state.pcounts, rd, jbuf, d32, False,
                rank_fn, so=SO_RLO)
            mix = (gX + stream).astype(I32) & 7
            return dataclasses.replace(
                rd,
                l=wrap(new_rd.l + mix),
                u=wrap(new_rd.u + mix),
                pk=jnp.where(
                    (new_rd.pk >= 0) & ((new_rd.pk & 7) == 0),
                    new_rd.pk
                    + (insb[0, 0].astype(I32) % 2 + n_ins.astype(I32) % 2 + 1),
                    new_rd.pk,
                ),
            )
        out = jax.lax.fori_loop(0, r, body, rd)
        return out.l[0] + out.pk[0]  # tiny fetch
    return chain

def timeit(name, jf):
    RLO_, RHI = 8, 40
    def t_of(R, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jf(rs, R))
            best = min(best, time.time() - t0)
        return best
    np.asarray(jf(rs, 1))  # compile
    per = (t_of(RHI) - t_of(RLO_)) / (RHI - RLO_)
    print(f"PLAN {name} {per*1e3:.2f} ms", flush=True)

def mk_rank_chain():
    @jax.jit
    def chain(rd, r):
        def body(i, rd):
            g = jnp.clip(rd.l + i, 0, n0)
            o1 = rank_global(state.bwt, state.blk_prefix, g, K)
            o2 = rank_global(state.bwt, state.blk_prefix,
                             jnp.clip(rd.u + i, 0, n0), K)
            return dataclasses.replace(
                rd, l=wrap(rd.l + (o1[:, 1] & 3)), u=wrap(rd.u + (o2[:, 2] & 3))
            )
        out = jax.lax.fori_loop(0, r, body, rd)
        return out.l[0] + out.u[0]
    return chain

timeit("rank2q_only", mk_rank_chain())
timeit("plan_norank", mk_chain("stub"))
timeit("plan_full", mk_chain("real"))

"""On-TPU sub-phase timings of the merge wrapper: scatters, searchsorted,
kernel, table build.  Chained in single jits to avoid per-call RTT."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from ropebwt2_tpu.index import merge_pallas as mp
mpROWS, mpWROWS, mpSUPER, mpSTACK_ROWS = mp._geom(mp.B)
from ropebwt2_tpu.index.scan import cumsum_blocked

M = 1 << 17
CAP = 1 << 24
K = 256
R = int(os.environ.get("PROBE_R", 20))
I32 = jnp.int32
rng = np.random.default_rng(0)

dev = jax.devices()[0]
print(f"MERGE device {dev.platform}:{dev.device_kind} M={M}", flush=True)

n0 = CAP // 2
bwt = np.full(CAP + mp.PAD_ROWS * mp.LANE, 6, np.int8)
bwt[:n0] = rng.integers(0, 6, n0)
jb = jnp.asarray(bwt)
pos = np.sort(rng.integers(0, n0, M)).astype(np.int32)
sym = rng.integers(0, 6, M).astype(np.int32)
stream = np.arange(M, dtype=np.int32)
jpos, jsym, jstream = map(jnp.asarray, (pos, sym, stream))
valid = jnp.ones(M, bool)
jn = jnp.asarray(n0, jnp.int64)

def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

def timeit(name, jf, *args):
    out = jf(*args); fetch(out)
    t0 = time.time(); out = jf(*args); fetch(out)
    dt = (time.time() - t0) / R
    print(f"MERGE {name} {dt*1e3:.2f} ms", flush=True)

nb = CAP // mp.B

@jax.jit
def scatter_insmap(p, s):
    def body(i, carry):
        p, s = carry
        insmap = jnp.zeros((CAP,), jnp.int8)
        insmap = insmap.at[p].set((s + 1).astype(jnp.int8),
                                  mode="drop", unique_indices=True)
        return p + insmap[0].astype(I32), s
    return jax.lax.fori_loop(0, R, body, (p, s))

@jax.jit
def scatter_dest_s(p, st):
    def body(i, carry):
        p, st = carry
        dest_s = jnp.full((M + mp.B,), CAP, I32)
        dest_s = dest_s.at[st].set(p, mode="drop", unique_indices=True)
        return p + (dest_s[0] & 1), st
    return jax.lax.fori_loop(0, R, body, (p, st))

@jax.jit
def ssorted(p):
    def body(i, p):
        bounds = jnp.arange(nb + 1, dtype=I32) * mp.B
        si = jnp.searchsorted(p, bounds, side="left").astype(I32)
        return p + (si[0] & 1)
    return jax.lax.fori_loop(0, R, body, p)

@jax.jit
def full_merge(b, p, s, st):
    def body(i, carry):
        b, p = carry
        nb2, _ = mp.merge_pallas(b, p, s, st, valid, n=jn, K=K)
        return nb2, p + nb2[0].astype(I32)
    return jax.lax.fori_loop(0, R, body, (b, p))

# kernel-only: precompute insmap/start_ins outside, time pallas_call+tables
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kernel_only(b, insmap, start_ins):
    cap_rows = CAP // mp.LANE
    nsb_total = cap_rows // mp.SROWS
    new_bwt, cnt_out = pl.pallas_call(
        mp._merge_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + mp.PAD_ROWS, mp.LANE), jnp.int8),
            jax.ShapeDtypeStruct((nsb_total * 8, mp.SROWS), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp.SWROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((mp.SWROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((8, mp.SROWS), I32),
            pltpu.VMEM((8, mp.SROWS), I32),
            pltpu.VMEM((mp.SWROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, mp.LANE), jnp.int8),
            pltpu.VMEM((mpSTACK_ROWS, mp.LANE), I32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(start_ins, b.reshape(cap_rows + mp.PAD_ROWS, mp.LANE),
      insmap.reshape(cap_rows, mp.LANE))
    return new_bwt, cnt_out

insmap_np = np.zeros(CAP, np.int8)
insmap_np[pos + stream] = sym + 1
start_np = np.searchsorted(pos + stream, np.arange(nb + 1) * mp.B).astype(np.int32)
nsb_active = int(min((n0 + M + mpSUPER_B - 1) // (mpSUPER_B),
                     CAP // (mpSUPER_B)))
start_np = np.concatenate([start_np, [nsb_active]]).astype(np.int32)
jinsmap = jnp.asarray(insmap_np)
jstart = jnp.asarray(start_np)

@jax.jit
def kernel_chain(b):
    def body(i, b):
        nb2, _ = _kernel_only(b, jinsmap, jstart)
        return nb2.reshape(b.shape)
    return jax.lax.fori_loop(0, R, body, b)

@jax.jit
def tables_chain(b):
    cap_rows = CAP // mp.LANE
    nsb_total = cap_rows // mp.SROWS
    _, cnt_out = _kernel_only(b, jinsmap, jstart)
    def body(i, x):
        rows6 = jnp.transpose(
            cnt_out.reshape(nsb_total, 8, mp.SROWS)[:, :6, :], (0, 2, 1)
        ).reshape(cap_rows, 6)
        kk = K // mp.LANE
        blk_cnt = rows6.reshape(cap_rows // kk, kk, 6).sum(axis=1, dtype=I32)
        blk_prefix = jnp.concatenate(
            [jnp.zeros((1, 6), I32), cumsum_blocked(blk_cnt),
             jnp.zeros(((mp.PAD_ROWS * mp.LANE) // K, 6), I32)]
        )
        return x + blk_prefix[1, 0]
    return jax.lax.fori_loop(0, R, body, jnp.asarray(0, I32))

timeit("scatter_insmap", scatter_insmap, jpos + jstream, jsym)
timeit("scatter_dest_s", scatter_dest_s, jpos + jstream, jstream)
timeit("searchsorted", ssorted, jpos)
timeit("kernel_only", kernel_chain, jb)
timeit("tables", tables_chain, jb)
timeit("full_merge", full_merge, jb, jpos, jsym, jstream)

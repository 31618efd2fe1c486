"""Kernel cost model, sound protocol: tiny scalar fetch (4 B, not the
16.8 MB buffer) and two chain lengths differenced to cancel dispatch RTT,
transfer, and fixed overheads.  per_sb = d(total)/d(R)/nsb."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ropebwt2_tpu.index import merge_pallas as mp
mpROWS, mpWROWS, mpSUPER, mpSTACK_ROWS = mp._geom(mp.B)

I32 = jnp.int32
CAP = 1 << 24
LANE = mp.LANE
rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"SCALE device {dev.platform}:{dev.device_kind}", flush=True)

cap_rows = CAP // LANE
nb = CAP // mp.B
nsb_total = cap_rows // mp.SROWS
bwt = rng.integers(0, 6, (cap_rows + mp.PAD_ROWS, LANE)).astype(np.int8)
insmap = np.zeros((cap_rows, LANE), np.int8)
jb = jnp.asarray(bwt)
ji = jnp.asarray(insmap)


def kernel_call(b, insm, start_ins):
    return pl.pallas_call(
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
            jax.ShapeDtypeStruct((cap_rows + mp.PAD_ROWS, LANE), jnp.int8),
            jax.ShapeDtypeStruct((nsb_total * 8, mp.SROWS), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mp.SWROWS, LANE), jnp.int8),
            pltpu.VMEM((mp.SWROWS, LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, LANE), jnp.int8),
            pltpu.VMEM((8, mp.SROWS), I32),
            pltpu.VMEM((8, mp.SROWS), I32),
            pltpu.VMEM((mp.SWROWS, LANE), jnp.int8),
            pltpu.VMEM((mp.SROWS, LANE), jnp.int8),
            pltpu.VMEM((mpSTACK_ROWS, LANE), I32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(start_ins, b, insm)


@jax.jit
def chain(b, start_ins, r):
    def body(i, b):
        nb2, _ = kernel_call(b, ji, start_ins)
        return nb2
    out = jax.lax.fori_loop(0, r, body, b)
    return out[0, 0].astype(I32)  # 4-byte fetch


def mk_start(nsb):
    s = np.zeros(nb + 2, np.int32)
    s[-1] = nsb
    return jnp.asarray(s)


def t_of(b, st, R, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        int(chain(b, st, R))
        best = min(best, time.time() - t0)
    return best


int(chain(jb, mk_start(1), 1))  # compile once

RLO_, RHI = 8, 48
for nsb in (1, 8, 32, 65, 128):
    st = mk_start(nsb)
    tlo = t_of(jb, st, RLO_)
    thi = t_of(jb, st, RHI)
    per_call = (thi - tlo) / (RHI - RLO_)
    print(f"SCALE nsb={nsb:3d} per_call={per_call*1e3:7.3f} ms "
          f"per_sb={per_call/nsb*1e6:7.1f} us  (tlo={tlo*1e3:.1f} thi={thi*1e3:.1f})",
          flush=True)

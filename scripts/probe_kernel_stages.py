"""Time the merge kernel's compute stages in isolation (VMEM-resident, no
DMA): stack+align, expand, counts.  Each probe is one pallas_call that loops
the stage ITERS times on VMEM data; per-iteration cost printed in us.

Run with a single compile per stage; chained so nothing is DCE'd."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ropebwt2_tpu.index import merge_pallas as mp
mpROWS, mpWROWS, mpSUPER, mpSTACK_ROWS = mp._geom(mp.B)

I32 = jnp.int32
ITERS = 3000
LANE = mp.LANE
dev = jax.devices()[0]
print(f"STAGE device {dev.platform}:{dev.device_kind} iters={ITERS}", flush=True)

rng = np.random.default_rng(0)
old_np = rng.integers(0, 6, (mp.SWROWS, LANE)).astype(np.int8)
ins_np = (rng.random((mp.SROWS, LANE)) < 0.01).astype(np.int8) * (
    rng.integers(0, 6, (mp.SROWS, LANE)).astype(np.int8) + 1
)
rem_np = rng.integers(0, 1024, (mpSTACK_ROWS, 1)).astype(np.int32)


def mk(kernel_body):
    f = pl.pallas_call(
        kernel_body,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANE), I32),
        scratch_shapes=[pltpu.VMEM((mpSTACK_ROWS, LANE), I32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(f)


def body_align(old_ref, ins_ref, rem_ref, out_ref, stackv):
    with jax.enable_x64(False):
        def it(i, acc):
            for j in range(mpSUPER):
                off = pl.multiple_of((((i + j) % 2) * 8), 8)
                stackv[j * mpWROWS:(j + 1) * mpWROWS, :] = old_ref[
                    pl.ds(off, mpWROWS), :].astype(I32)
            stv = mp._align_windows(stackv[...], rem_ref[...] + acc)
            return acc + stv[0, 0] * 0 + stv[5, 5] % 2
        acc = jax.lax.fori_loop(0, ITERS, it, jnp.asarray(0, I32))
        out_ref[...] = jnp.full((8, LANE), acc, I32)


def body_expand(old_ref, ins_ref, rem_ref, out_ref, stackv):
    with jax.enable_x64(False):
        aligned0 = old_ref[pl.ds(0, mp.SROWS), :].astype(I32)
        def it(i, acc):
            insm32 = ins_ref[...].astype(I32) + (acc % 2)
            out = mp._expand(insm32, aligned0)
            return acc + out[5, 5] % 2
        acc = jax.lax.fori_loop(0, ITERS, it, jnp.asarray(0, I32))
        out_ref[...] = jnp.full((8, LANE), acc, I32)


def body_counts(old_ref, ins_ref, rem_ref, out_ref, stackv):
    with jax.enable_x64(False):
        out0 = old_ref[pl.ds(0, mp.SROWS), :].astype(I32)
        def it(i, acc):
            out = out0 + (acc % 2)
            ones_row = jnp.ones((1, LANE), jnp.float32)
            crows = []
            for sidx in range(6):
                ind = (out == sidx).astype(jnp.float32)
                crows.append(jax.lax.dot_general(
                    ones_row, ind, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            crows.append(jnp.zeros((2, mp.SROWS), jnp.float32))
            cnt = jnp.concatenate(crows, axis=0).astype(I32)
            return acc + cnt[0, 0] % 2
        acc = jax.lax.fori_loop(0, ITERS, it, jnp.asarray(0, I32))
        out_ref[...] = jnp.full((8, LANE), acc, I32)


def body_segprefix(old_ref, ins_ref, rem_ref, out_ref, stackv):
    with jax.enable_x64(False):
        def it(i, acc):
            insm32 = ins_ref[...].astype(I32) + (acc % 2)
            c = mp._seg_flat_prefix(jnp.where(insm32 != 0, 1, 0).astype(I32))
            return acc + c[5, 5] % 2
        acc = jax.lax.fori_loop(0, ITERS, it, jnp.asarray(0, I32))
        out_ref[...] = jnp.full((8, LANE), acc, I32)


jo = jnp.asarray(old_np)
ji = jnp.asarray(ins_np)
jr = jnp.asarray(rem_np)


def timeit(name, body):
    try:
        f = mk(body)
        out = f(jo, ji, jr)
        np.asarray(out)
        t0 = time.time()
        out = f(jo, ji, jr)
        np.asarray(out)
        dt = (time.time() - t0) / ITERS
        print(f"STAGE {name} {dt*1e6:.1f} us/iter", flush=True)
    except Exception as e:
        print(f"STAGE {name} FAILED: {type(e).__name__}: {e}", flush=True)


timeit("stack+align", body_align)
timeit("segprefix", body_segprefix)
timeit("expand(incl segprefix)", body_expand)
timeit("counts", body_counts)

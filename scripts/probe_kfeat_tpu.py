"""Probe Mosaic features that could cut merge-kernel passes:

1. int8 select: jnp.where(i32-derived mask, int8, int8) in-kernel — if it
   compiles, align/expand passes can run at 1 byte/elem instead of 4.
2. unaligned VMEM dynamic sublane slice: pl.ds(dynamic_not_multiple_of_8)
   on a VMEM ref — folds the row part of window alignment into the copy.
3. pltpu.roll with a DYNAMIC scalar shift (lane axis) — one-op per-window
   lane alignment instead of 7 conditional shift passes.

Each test compiles + runs a tiny kernel and prints OK/FAIL with the error
head.  Run on the real chip.
"""
import sys
import functools

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM(args[0].shape, args[0].dtype),
                pltpu.VMEM(out_shape.shape, out_shape.dtype),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )
        out = jax.jit(f)(*args)
        return np.asarray(out), None
    except Exception as e:  # noqa: BLE001
        return None, str(e)[:300]


def main():
    dev = jax.devices()[0]
    print(f"KFEAT device {dev.platform}:{dev.device_kind}", flush=True)
    rng = np.random.default_rng(0)
    x8 = rng.integers(0, 7, (64, 128)).astype(np.int8)
    jx = jnp.asarray(x8)

    # --- 1. int8 select under i32 mask ---
    def k_sel(x_hbm, o_hbm, xv, ov, sem):
        with jax.enable_x64(False):
            cp = pltpu.make_async_copy(x_hbm, xv, sem.at[0])
            cp.start(); cp.wait()
            v = xv[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
            shifted = jnp.concatenate(
                [jnp.zeros((64, 8), v.dtype), v[:, :120]], axis=1
            )
            ov[...] = jnp.where((lane & 8) != 0, shifted, v)
            cp2 = pltpu.make_async_copy(ov, o_hbm, sem.at[1])
            cp2.start(); cp2.wait()

    out, err = try_kernel(
        "int8sel", k_sel, jax.ShapeDtypeStruct((64, 128), jnp.int8), jx
    )
    if err is None:
        lane = np.arange(128)[None, :]
        shifted = np.concatenate(
            [np.zeros((64, 8), np.int8), x8[:, :120]], axis=1
        )
        want = np.where((lane & 8) != 0, shifted, x8)
        print(f"KFEAT int8-select: OK exact={np.array_equal(out, want)}",
              flush=True)
    else:
        print(f"KFEAT int8-select: FAIL {err}", flush=True)

    # --- 2. unaligned VMEM dynamic sublane slice ---
    def k_slice(x_hbm, o_hbm, xv, ov, sem):
        with jax.enable_x64(False):
            cp = pltpu.make_async_copy(x_hbm, xv, sem.at[0])
            cp.start(); cp.wait()
            start = xv[0, 0].astype(jnp.int32) & 7  # dynamic, NOT mult of 8
            ov[...] = xv[pl.ds(start, 32), :].astype(jnp.int8)
            cp2 = pltpu.make_async_copy(ov, o_hbm, sem.at[1])
            cp2.start(); cp2.wait()

    out, err = try_kernel(
        "uslice", k_slice, jax.ShapeDtypeStruct((32, 128), jnp.int8), jx
    )
    if err is None:
        st = int(x8[0, 0]) & 7
        want = x8[st : st + 32]
        print(f"KFEAT unaligned-vmem-slice: OK exact={np.array_equal(out, want)}",
              flush=True)
    else:
        print(f"KFEAT unaligned-vmem-slice: FAIL {err}", flush=True)

    # --- 3. pltpu.roll dynamic lane shift ---
    def k_roll(x_hbm, o_hbm, xv, ov, sem):
        with jax.enable_x64(False):
            cp = pltpu.make_async_copy(x_hbm, xv, sem.at[0])
            cp.start(); cp.wait()
            v = xv[...].astype(jnp.int32)
            s = xv[0, 0].astype(jnp.int32) & 127  # dynamic shift
            r = pltpu.roll(v, s, 1)
            ov[...] = r.astype(jnp.int8)
            cp2 = pltpu.make_async_copy(ov, o_hbm, sem.at[1])
            cp2.start(); cp2.wait()

    out, err = try_kernel(
        "roll", k_roll, jax.ShapeDtypeStruct((64, 128), jnp.int8), jx
    )
    if err is None:
        s = int(x8[0, 0]) & 127
        want = np.roll(x8, s, axis=1)
        ok = np.array_equal(out, want)
        ok2 = np.array_equal(out, np.roll(x8, -s, axis=1))
        print(f"KFEAT roll-dynamic: OK fwd={ok} rev={ok2}", flush=True)
    else:
        print(f"KFEAT roll-dynamic: FAIL {err}", flush=True)

    # --- 4. int8 roll (static) ---
    def k_roll8(x_hbm, o_hbm, xv, ov, sem):
        with jax.enable_x64(False):
            cp = pltpu.make_async_copy(x_hbm, xv, sem.at[0])
            cp.start(); cp.wait()
            ov[...] = pltpu.roll(xv[...], 5, 1)
            cp2 = pltpu.make_async_copy(ov, o_hbm, sem.at[1])
            cp2.start(); cp2.wait()

    out, err = try_kernel(
        "roll8", k_roll8, jax.ShapeDtypeStruct((64, 128), jnp.int8), jx
    )
    if err is None:
        want = np.roll(x8, 5, axis=1)
        print(f"KFEAT roll-int8-static: OK exact={np.array_equal(out, want)}",
              flush=True)
    else:
        print(f"KFEAT roll-int8-static: FAIL {err}", flush=True)


if __name__ == "__main__":
    main()

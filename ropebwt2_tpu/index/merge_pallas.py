"""Pallas TPU kernel for the BCR merge pass.

One grid step produces one B-symbol output block of the new BWT.  The
insertion pattern is precomputed OUTSIDE the kernel as one CAP-sized int8
array ``insmap`` (0 = no insertion at this output lane, s+1 = insert symbol
s) — built with an M-sized scatter, which XLA handles cheaply (it is the
CAP-sized element scatter that is catastrophically slow and that this kernel
replaces).  The kernel then:

  * DMAs the block's window of the OLD buffer.  The window start
    (b*B - start_ins[b], from a searchsorted prefix outside) is not
    lane-aligned, and Mosaic only allows 128-multiple dynamic lane offsets —
    so it fetches the 128-aligned superset and corrects with a uniform
    lane shift done as 7 conditional static rotations.
  * expands the old symbols around the insertion lanes: non-insertion lane p
    takes old[p - cnt_le[p]] where cnt_le = #insertion lanes <= p
    (a Hillis-Steele prefix sum of the insertion mask); the value is
    selected from a window vector shifted right one lane per t-loop step
    (t-loop trip count = this block's insertion count, few on average).
  * emits the new symbols AND their per-K-block counts, fusing the rank
    table rebuild into the same pass.

Traffic: ~4 bytes/symbol/round (old read, insmap build+read, new write) vs
~30+ for the XLA scatter formulation (merge.apply_insertions).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import NSYM
from .flat import PAD
from .scan import cumsum_blocked

B = 4096  # output block (symbols) per grid step
LANE = 128


def _shift_cumsum(x, width):
    """Inclusive prefix sum along the last axis of (1, width) via
    Hillis-Steele adds with static concat-shifts."""
    sh = 1
    while sh < width:
        shifted = jnp.concatenate(
            [jnp.zeros((1, sh), x.dtype), x[:, : width - sh]], axis=1
        )
        x = x + shifted
        sh <<= 1
    return x


def _lshift(x, r, out_w):
    """x[:, r:r+out_w] for a traced scalar 0 <= r <= 256 (the tail-clamped
    window can shift by exactly 2*LANE), via conditional static rotations
    (Mosaic forbids unaligned dynamic lane slicing)."""
    for k in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        rot = jnp.concatenate([x[:, k:], x[:, :k]], axis=1)
        bit = jnp.full((1, 1), (r & k) != 0)
        x = jnp.where(bit, rot, x)
    return x[:, :out_w]


def _merge_kernel(start_ref, old_hbm, insmap_ref, out_ref, cnt_ref,
                  oldv, sem, *, K):
    with jax.enable_x64(False):
        _merge_body(start_ref, old_hbm, insmap_ref, out_ref, cnt_ref,
                    oldv, sem, K=K)


def _merge_body(start_ref, old_hbm, insmap_ref, out_ref, cnt_ref,
                oldv, sem, *, K):
    cap = old_hbm.shape[1]
    W = B + 2 * LANE  # window incl. alignment + tail-clamp slack
    b = pl.program_id(0)
    s0 = start_ref[b]
    n_ins = start_ref[b + 1] - s0
    old_start = b * B - s0  # in [0, cap - B]
    # clamp the aligned window fully inside the array; r stays < 256
    a = jnp.minimum((old_start // LANE) * LANE, cap - W)
    a = pl.multiple_of(a, LANE)
    r = old_start - a

    cp = pltpu.make_async_copy(
        old_hbm.at[:, pl.ds(a, W)], oldv, sem
    )
    cp.start()

    insmap = insmap_ref[...]  # (1, B) int8; 0 = no insertion
    is_ins = (insmap != 0).astype(jnp.int32)
    cnt_le = _shift_cumsum(is_ins, B)

    cp.wait()
    old_local = _lshift(oldv[...], r, B)

    # expansion: lane p takes old[p - t] where t = cnt_le[p]; walk t upward
    # while shifting the window vector right one lane per step
    def step(t, carry):
        acc, v = carry
        acc = jnp.where((cnt_le == t) & (is_ins == 0), v, acc)
        v = jnp.concatenate([v[:, :1], v[:, : B - 1]], axis=1)
        return acc, v

    acc, _ = jax.lax.fori_loop(
        0, n_ins + 1, step, (jnp.full((1, B), PAD, jnp.int8), old_local)
    )
    out = jnp.where(insmap != 0, insmap - 1, acc)
    out_ref[...] = out

    # fused per-K-block symbol counts of the fresh output
    final = out.reshape(B // K, K)
    cols = [
        jnp.sum((final == s).astype(jnp.int32), axis=1, keepdims=True)
        for s in range(NSYM)
    ]
    cnt_ref[:, :] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def merge_pallas(bwt, pos, sym, stream, valid, *, K, interpret=False):
    """Apply one round's insertions; returns (new_bwt, blk_prefix).

    bwt int8[CAP]; pos/stream int64[M] (old-coord insertion points + tie
    ranks); sym int32[M]; valid bool[M].  Requires CAP % B == 0,
    CAP >= B + 256, CAP < 2^31."""
    cap = bwt.shape[0]
    m = pos.shape[0]
    nb = cap // B
    assert cap % B == 0 and cap >= B + 2 * LANE and cap < (1 << 31)

    dest = pos + stream  # new-coordinate destinations, strictly increasing
    trash = jnp.int64(cap + B)
    dest_masked = jnp.where(valid, dest, trash)

    # insmap[d] = sym+1 at insertion destinations, else 0
    insmap = jnp.zeros((cap,), jnp.int8)
    insmap = insmap.at[dest_masked].set(
        (sym + 1).astype(jnp.int8), mode="drop", unique_indices=True
    )

    # per-block insertion-count prefix (for old-window offsets): build the
    # stream-ordered destination list and searchsorted the block bounds
    stream_idx = jnp.where(valid, stream, m + B)  # invalid -> OOB -> dropped
    dest_s = jnp.full((m + B,), trash, jnp.int64)
    dest_s = dest_s.at[stream_idx].set(
        dest_masked, mode="drop", unique_indices=True
    )
    bounds = jnp.arange(nb + 1, dtype=jnp.int64) * B
    start_ins = jnp.searchsorted(
        dest_s[:m], bounds, side="left"
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # old bwt (1, CAP)
            pl.BlockSpec(
                (1, B), lambda b, s: (0, b), memory_space=pltpu.VMEM
            ),  # insmap block
        ],
        out_specs=[
            pl.BlockSpec((1, B), lambda b, s: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (B // K, NSYM), lambda b, s: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, B + 2 * LANE), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    new_bwt, cnts = pl.pallas_call(
        functools.partial(_merge_kernel, K=K),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, cap), jnp.int8),
            jax.ShapeDtypeStruct((cap // K, NSYM), jnp.int32),
        ],
        interpret=interpret,
    )(start_ins, bwt.reshape(1, cap), insmap.reshape(1, cap))
    blk_prefix = jnp.concatenate(
        [
            jnp.zeros((1, NSYM), jnp.int64),
            cumsum_blocked(cnts.astype(jnp.int64)),
        ]
    )
    return new_bwt.reshape(cap), blk_prefix

"""Pallas TPU kernel for the BCR merge pass (gridless formulation).

One pallas_call applies a whole round's insertions and rebuilds the
per-block rank counts.  The insertion pattern is precomputed OUTSIDE as one
CAP-sized int8 ``insmap`` (0 = no insertion at this output position,
s+1 = insert symbol s) via an M-sized scatter (cheap in XLA — it is the
CAP-sized element scatter this kernel replaces), plus a per-block
insertion-count prefix ``start_ins`` (searchsorted, SMEM-resident).

The attached toolchain rejects several standard Pallas constructs, which
dictates the shape of this kernel (probed empirically):

* grid + index_map pipelines do not legalize -> single invocation with an
  in-kernel fori_loop over output blocks and manual DMAs;
* int8 vectors only support load/widen/narrow/store (no compares) -> all
  compute in int32;
* arrays with a unit sublane dim and unaligned slices are rejected ->
  everything lives in (rows, 128) layout, DMA row starts/sizes are
  multiples of 8 rows, and the sub-row misalignment is corrected in-VMEM
  with uniform conditional static shifts;
* reduce-to-scalar inside the kernel emits 64-bit ops -> per-block
  insertion counts come from the SMEM prefix instead;
* python-int literals under jax x64 weak-promote to int64 (no 64-bit in
  Mosaic) -> the kernel body is traced under jax.enable_x64(False).

Per SUPER-block (SUPER output blocks of B symbols, one DMA round-trip):
each sub-block's old window starts at old_start = b*B - start_ins[b]; the
8-row-aligned superset (WROWS rows) is sliced from the super window and
flat-shifted by the sub-row remainder.  The expansion — non-insert position
p takes old[p - cnt_le[p]] (cnt_le = segmented prefix of the insertion
mask) — runs as ONE walk over all stacked sub-blocks, with trip count
max(insertions per sub-block).  Work is bounded to the live prefix
(n + #insertions).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import NSYM
from .flat import PAD
from .scan import cumsum_blocked

B = 4096  # symbols per output block (the expand-walk granularity)
LANE = 128
ROWS = B // LANE  # 32 rows per output block
WROWS = 40  # old-window rows per block: 32 + 8 (sub-window alignment slack)
SUPER = 32  # output blocks fetched/stored per DMA round-trip
SROWS = SUPER * ROWS  # 1024 rows = 131072 symbols per DMA round-trip
SWROWS = SROWS + 16  # super window: SUPER blocks + alignment + edge slack
PAD_ROWS = 16  # input padded by this much so windows never clamp
I32 = jnp.int32


def _flat_shift_left(v, r, max_bits):
    """Flattened-order left shift of a (rows, 128) int32 array by a traced
    scalar r (0 <= r < 2^max_bits), via conditional static shifts; vacated
    tail positions are garbage (callers never select them)."""
    rows = v.shape[0]
    for k in [1 << i for i in range(max_bits - 1, -1, -1)]:
        if k % LANE == 0:  # whole-row shift
            q = k // LANE
            sh = jnp.concatenate([v[q:, :], v[:q, :]], axis=0)
        else:  # lane shift with row carry: position p takes p + k
            nxt = jnp.concatenate([v[1:, :], v[:1, :]], axis=0)
            sh = jnp.concatenate([v[:, k:], nxt[:, :k]], axis=1)
        bit = jnp.full((1, 1), (r & k) != 0)
        v = jnp.where(bit, sh, v)
    return v


def _flat_shift_right1(v):
    """Position p takes p-1 (garbage enters at position 0)."""
    prv = jnp.concatenate([v[:1, :], v[:-1, :]], axis=0)  # row r-1
    return jnp.concatenate([prv[:, LANE - 1 :], v[:, : LANE - 1]], axis=1)


def _merge_kernel(start_ref, old_hbm, ins_hbm, *refs, emit_counts):
    with jax.enable_x64(False):
        _merge_body(start_ref, old_hbm, ins_hbm, *refs,
                    emit_counts=emit_counts)


def _seg_flat_prefix(x):
    """Inclusive prefix sum over flattened order, SEGMENTED per sub-block
    (every ROWS rows restart); masks are static."""
    srows = x.shape[0]
    tot = jnp.sum(x, axis=1, keepdims=True)  # row totals
    sh = 1
    while sh < LANE:  # lane prefix within rows
        x = x + jnp.concatenate(
            [jnp.zeros((srows, sh), x.dtype), x[:, : LANE - sh]], axis=1
        )
        sh <<= 1
    row_in_block = jax.lax.broadcasted_iota(I32, (srows, 1), 0) % ROWS
    sh = 1
    csum = tot
    while sh < ROWS:  # segmented row-total prefix
        shifted = jnp.concatenate(
            [jnp.zeros((sh, 1), x.dtype), csum[: srows - sh, :]], axis=0
        )
        csum = csum + jnp.where(row_in_block >= sh, shifted, 0)
        sh <<= 1
    return x + (csum - tot)


def _merge_body(start_ref, old_hbm, ins_hbm, *refs, emit_counts):
    if emit_counts:
        (out_ref, cnt_ref, oldv, insv, outv, alignv, cntv, sems) = refs
        _merge_body_serial(start_ref, old_hbm, ins_hbm, out_ref, cnt_ref,
                           oldv, insv, outv, alignv, cntv, sems)
    else:
        (out_ref, oldA, oldB, insA, insB, outA, outB, alignv, sems) = refs
        _merge_body_pipelined(start_ref, old_hbm, ins_hbm, out_ref,
                              oldA, oldB, insA, insB, outA, outB,
                              alignv, sems)


def _window_scalars(start_ref, sb):
    """(rowq_s, b0) for super-block sb."""
    b0 = sb * SUPER
    old_start_first = b0 * B - start_ref[b0]
    rowq_s = pl.multiple_of((old_start_first // (8 * LANE)) * 8, 8)
    return rowq_s, b0


def _stage1_align(start_ref, oldv, alignv, rowq_s, b0):
    """Per-sub-block aligned old windows stacked into alignv; returns the
    max insertion count across the SUPER sub-blocks."""
    max_ins = jnp.int32(0)
    for j in range(SUPER):  # static unroll
        b = b0 + j
        s0 = start_ref[b]
        max_ins = jnp.maximum(max_ins, start_ref[b + 1] - s0)
        old_start = b * B - s0
        rowq_j = pl.multiple_of((old_start // (8 * LANE)) * 8, 8)
        off = pl.multiple_of(rowq_j - rowq_s, 8)
        rem = old_start - rowq_j * LANE  # < 1024
        old32 = oldv[pl.ds(off, WROWS), :].astype(I32)
        al = _flat_shift_left(old32, rem, 10)[:ROWS, :]
        alignv[j * ROWS : (j + 1) * ROWS, :] = al.astype(jnp.int8)
    return max_ins


def _expand(insmap, alignv, max_ins):
    is_ins = (insmap != 0).astype(I32)
    sel = jnp.where(is_ins != 0, -1, _seg_flat_prefix(is_ins))

    def step(t, carry):
        acc, v = carry
        acc = jnp.where(sel == t, v, acc)
        return acc, _flat_shift_right1(v)

    acc, _ = jax.lax.fori_loop(
        0, max_ins + 1, step,
        (jnp.full((SROWS, LANE), PAD, I32), alignv[...].astype(I32)),
    )
    return jnp.where(is_ins != 0, insmap - 1, acc)


def _merge_body_pipelined(start_ref, old_hbm, ins_hbm, out_ref,
                          oldA, oldB, insA, insB, outA, outB,
                          alignv, sems):
    """Double-buffered: super-block sb+1's input DMAs overlap sb's compute;
    output DMAs drain one super-block behind.  Slot = sb parity; semaphores
    0/1 = old A/B, 2/3 = ins A/B, 4/5 = out A/B."""
    cap_rows = old_hbm.shape[0] - PAD_ROWS
    nb_static = cap_rows // ROWS
    nsb = start_ref[nb_static + 1]  # active super-blocks (dynamic)

    def in_copies(sb, slot):
        rowq_s, _ = _window_scalars(start_ref, sb)
        oldv, insv = (oldA, insA) if slot == 0 else (oldB, insB)
        cp_old = pltpu.make_async_copy(
            old_hbm.at[pl.ds(rowq_s, SWROWS), :], oldv, sems.at[slot]
        )
        cp_ins = pltpu.make_async_copy(
            ins_hbm.at[pl.ds(sb * SROWS, SROWS), :], insv, sems.at[2 + slot]
        )
        return cp_old, cp_ins

    def out_copy(sb, slot):
        outv = outA if slot == 0 else outB
        return pltpu.make_async_copy(
            outv, out_ref.at[pl.ds(sb * SROWS, SROWS), :], sems.at[4 + slot]
        )

    def start_in(sb):
        for slot in (0, 1):
            @pl.when((sb % 2) == slot)
            def _():
                a, b = in_copies(sb, slot)
                a.start()
                b.start()

    @pl.when(nsb > 0)
    def _():
        start_in(0)

    def super_body(sb, _):
        rowq_s, b0 = _window_scalars(start_ref, sb)
        for slot in (0, 1):
            is_slot = (sb % 2) == slot
            oldv, insv = (oldA, insA) if slot == 0 else (oldB, insB)
            outv = outA if slot == 0 else outB

            @pl.when(is_slot)
            def _():
                a, b = in_copies(sb, slot)
                a.wait()
                b.wait()

        @pl.when(sb + 1 < nsb)
        def _():
            start_in(sb + 1)

        slot0 = (sb % 2) == 0

        # stage 1 under parity (ref reads need a concrete scratch)
        max0 = jnp.int32(0)
        for slot in (0, 1):
            oldv = oldA if slot == 0 else oldB

            # compute max_ins (pure scalars) once; align writes per slot
            @pl.when((sb % 2) == slot)
            def _():
                _stage1_align(start_ref, oldv, alignv, rowq_s, b0)

        max_ins = jnp.int32(0)
        for j in range(SUPER):
            max_ins = jnp.maximum(
                max_ins, start_ref[b0 + j + 1] - start_ref[b0 + j]
            )

        insmap = jnp.where(
            jnp.full((1, 1), slot0), insA[...], insB[...]
        ).astype(I32)
        out = _expand(insmap, alignv, max_ins)

        for slot in (0, 1):
            outv = outA if slot == 0 else outB

            @pl.when(((sb % 2) == slot) & (sb >= 2))
            def _():
                out_copy(sb - 2, slot).wait()  # free the slot

            @pl.when((sb % 2) == slot)
            def _():
                outv[...] = out.astype(jnp.int8)
                out_copy(sb, slot).start()

        return 0

    jax.lax.fori_loop(0, nsb, super_body, 0)

    for back in (2, 1):  # drain the last (up to two) output DMAs
        @pl.when(nsb >= back)
        def _():
            sb = nsb - back
            for slot in (0, 1):
                @pl.when((sb % 2) == slot)
                def _():
                    out_copy(sb, slot).wait()


def _merge_body_serial(start_ref, old_hbm, ins_hbm, out_ref, cnt_ref,
                       oldv, insv, outv, alignv, cntv, sems):
    cap_rows = old_hbm.shape[0] - PAD_ROWS
    nb_static = cap_rows // ROWS
    nsb = start_ref[nb_static + 1]  # active super-blocks (dynamic)

    def super_body(sb, _):
        rowq_s, b0 = _window_scalars(start_ref, sb)
        cp_old = pltpu.make_async_copy(
            old_hbm.at[pl.ds(rowq_s, SWROWS), :], oldv, sems.at[0]
        )
        cp_ins = pltpu.make_async_copy(
            ins_hbm.at[pl.ds(sb * SROWS, SROWS), :], insv, sems.at[1]
        )
        cp_old.start()
        cp_ins.start()
        cp_old.wait()
        max_ins = _stage1_align(start_ref, oldv, alignv, rowq_s, b0)
        cp_ins.wait()
        out = _expand(insv[...].astype(I32), alignv, max_ins)
        outv[...] = out.astype(jnp.int8)
        cp_out = pltpu.make_async_copy(
            outv, out_ref.at[pl.ds(sb * SROWS, SROWS), :], sems.at[2]
        )
        cp_out.start()

        # fused per-ROW (K=128) symbol counts: contract lanes on the
        # MXU so counts land in the LANE dimension (DMA-able)
        ones_row = jnp.ones((1, LANE), jnp.float32)
        rows = []
        for sidx in range(NSYM):
            ind = (out == sidx).astype(jnp.float32)
            rows.append(
                jax.lax.dot_general(
                    ones_row, ind,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (1, SROWS)
        rows.append(jnp.zeros((2, SROWS), jnp.float32))  # pad sublanes
        cntv[...] = jnp.concatenate(rows, axis=0).astype(I32)
        cp_cnt = pltpu.make_async_copy(
            cntv, cnt_ref.at[pl.ds(sb * 8, 8), :], sems.at[3]
        )
        cp_cnt.start()
        cp_cnt.wait()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, nsb, super_body, 0)


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def merge_pallas(bwt, pos, sym, stream, valid, n=None, *, K,
                 interpret=False):
    """Apply one round's insertions; returns (new_bwt, blk_prefix).

    ``n`` (current content size) bounds the work to the live prefix: blocks
    past n + #insertions are left untouched (their garbage is never read —
    queries stay below n and table prefixes only accumulate upward).

    bwt int8[CAP]; pos/stream int[M] (old-coord insertion points + tie
    ranks, int32 or int64); sym int32[M]; valid bool[M].  Requires
    CAP % (SUPER*B) == 0 (multiples of 131072), CAP < 2^31, K % LANE == 0."""
    cap = bwt.shape[0]
    m = pos.shape[0]
    nb = cap // B
    cap_rows = cap // LANE
    assert cap % (SUPER * B) == 0 and cap < (1 << 31)
    assert K % LANE == 0

    pdt = pos.dtype
    dest = pos + stream  # new-coordinate destinations, strictly increasing
    trash = jnp.asarray(cap + B, pdt)
    dest_masked = jnp.where(valid, dest, trash)

    # insmap[d] = sym+1 at insertion destinations, else 0
    insmap = jnp.zeros((cap,), jnp.int8)
    insmap = insmap.at[dest_masked].set(
        (sym + 1).astype(jnp.int8), mode="drop", unique_indices=True
    )

    # per-block insertion-count prefix: stream-ordered destinations are
    # sorted, so block bounds come from one searchsorted
    stream_idx = jnp.where(valid, stream, m + B)  # invalid -> OOB -> dropped
    dest_s = jnp.full((m + B,), trash, pdt)
    dest_s = dest_s.at[stream_idx].set(
        dest_masked, mode="drop", unique_indices=True
    )
    bounds = jnp.arange(nb + 1, dtype=pdt) * B
    start_ins = jnp.searchsorted(
        dest_s[:m], bounds, side="left"
    ).astype(I32)
    if n is None:
        nsb_active = jnp.asarray(cap // (SUPER * B), I32)
    else:
        total = n.astype(jnp.int64) + start_ins[-1].astype(jnp.int64)
        nsb_active = jnp.minimum(
            (total + SUPER * B - 1) // (SUPER * B), cap // (SUPER * B)
        ).astype(I32)
    start_ins = jnp.concatenate([start_ins, nsb_active[None]])

    old_padded = jnp.concatenate(
        [bwt, jnp.full((PAD_ROWS * LANE,), PAD, jnp.int8)]
    )
    nsb_total = cap_rows // SROWS
    emit_counts = K == LANE
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((cap_rows, LANE), jnp.int8)]
    if emit_counts:  # serial body: oldv, insv, outv, alignv, cntv
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((nsb_total * 8, SROWS), I32)
        )
        scratch = [
            pltpu.VMEM((SWROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
            pltpu.VMEM((8, SROWS), I32),
        ]
    else:  # pipelined body: oldA/B, insA/B, outA/B, alignv
        scratch = [
            pltpu.VMEM((SWROWS, LANE), jnp.int8),
            pltpu.VMEM((SWROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
            pltpu.VMEM((SROWS, LANE), jnp.int8),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((6,)))
    outs = pl.pallas_call(
        functools.partial(_merge_kernel, emit_counts=emit_counts),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # start_ins
            pl.BlockSpec(memory_space=pl.ANY),  # old bwt (rows, 128)
            pl.BlockSpec(memory_space=pl.ANY),  # insmap (rows, 128)
        ],
        out_specs=out_specs if emit_counts else out_specs[0],
        out_shape=out_shape if emit_counts else out_shape[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(start_ins, old_padded.reshape(cap_rows + PAD_ROWS, LANE),
      insmap.reshape(cap_rows, LANE))
    if emit_counts:
        new_bwt, cnt_out = outs
    else:
        new_bwt = outs
    new_bwt = new_bwt.reshape(cap)

    if emit_counts:
        # counts fused in the kernel: (nsb, 8, SROWS) -> (cap_rows, 6)
        rows6 = jnp.transpose(
            cnt_out.reshape(nsb_total, 8, SROWS)[:, :NSYM, :], (0, 2, 1)
        ).reshape(cap_rows, NSYM)
        blk_prefix = jnp.concatenate(
            [
                jnp.zeros((1, NSYM), jnp.int64),
                cumsum_blocked(rows6.astype(jnp.int64)),
            ]
        )
        return new_bwt, blk_prefix

    from .rank import build_block_tables

    return new_bwt, build_block_tables(new_bwt, K)

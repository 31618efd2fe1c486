"""Pallas TPU kernel for the BCR merge pass (gridless formulation).

One pallas_call applies a whole round's insertions and emits per-row
(128-symbol) rank counts, from which the K-block rank prefix is built
outside with one small int32 cumsum.  The insertion pattern is precomputed
OUTSIDE as one CAP-sized int8 ``insmap`` (0 = no insertion at this output
position, s+1 = insert symbol s) via an M-sized scatter, plus a per-block
insertion-count prefix ``start_ins`` (searchsorted, SMEM-resident).

The input buffer must carry PAD_ROWS rows of permanent tail slack
(FlatBwt allocates it, index/flat.py): aligned window DMAs read up to
PAD_ROWS rows past the logical capacity.  The output buffer carries the
same slack; rows past the live prefix are left UNINITIALIZED — consumers
never read beyond n (see flat.py).

The attached toolchain rejects several standard Pallas constructs, which
dictates the shape of this kernel (probed empirically):

* grid + index_map pipelines do not legalize -> single invocation with an
  in-kernel fori_loop over output super-blocks and manual DMAs;
* int8 vectors only support load/widen/narrow/store (no compares) -> all
  compute in int32;
* arrays with a unit sublane dim and unaligned slices are rejected ->
  everything lives in (rows, 128) layout, DMA row starts/sizes are
  multiples of 8 rows;
* reduce-to-scalar inside the kernel emits 64-bit ops -> per-block
  insertion counts come from the SMEM prefix instead;
* python-int literals under jax x64 weak-promote to int64 (no 64-bit in
  Mosaic) -> the kernel body is traced under jax.enable_x64(False).

Algorithm per SUPER-block (SUPER output blocks of B symbols, one DMA
round-trip), all arrays in flattened (rows, 128) order:

1. stack the 32 sub-blocks' 8-row-aligned old windows (WROWS rows each)
   into one scratch, then fix each window's sub-row misalignment with ONE
   batched conditional-shift pass (10 static shifts selected per-window by
   a per-row remainder vector) — instead of 32 independent shift chains.
2. expand: non-insert output position p takes old[p - c(p)] where c is the
   per-block inclusive prefix of the insertion mask.  Because c is
   non-decreasing with slope <= 1, the variable-distance gather decomposes
   into log2(B) = 12 static conditional shifts processing the bits of c
   from high to low (each position takes the shifted value iff its own
   c-bit is set and the source stays inside its block).  This replaces the
   O(max insertions per block) walk of the previous design and makes
   dense rounds no slower than sparse ones.
3. per-row symbol counts land in the LANE dimension via an MXU
   ones-contraction and stream out on their own DMA.

Input DMAs for super-block sb+1 overlap sb's compute (slot-parity double
buffering); output and count DMAs drain one super-block behind.  Slot
buffers are only ever READ under their parity guard (copied into shared
scratch), never while the opposite slot's DMA may be in flight.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import NSYM
from .scan import cumsum_blocked

B = 4096  # symbols per output block (the expand granularity), default
LANE = 128
SUPER_B = 131072  # symbols per DMA round-trip (SUPER * B, geometry-fixed)
SROWS = SUPER_B // LANE  # 1024 rows per DMA round-trip
SWROWS = SROWS + 16  # super window: SUPER blocks + alignment + edge slack
PAD_ROWS = 16  # permanent input/output tail slack so windows never clamp
I32 = jnp.int32


def pick_block(cap: int) -> int:
    """Expand-block size for a capacity: B = 4096 measures fastest, but the
    per-block insertion-start table lives in SMEM (~1 MB on v5e), so big
    capacities need coarser blocks: cap/B + 2 int32 entries must stay well
    under the SMEM budget (<= 512 KB here)."""
    b = B
    while cap // b + 2 > (1 << 17):
        b *= 2
    return b


def _geom(b: int):
    """(rows, wrows, super, stack_rows) for expand-block size ``b``."""
    rows = b // LANE
    return rows, rows + 8, SUPER_B // b, SUPER_B // b * (rows + 8)


def _row_rotate_down(v, q):
    """sh[r] = v[r - q] (wrapped; callers mask wrapped rows)."""
    return jnp.concatenate([v[v.shape[0] - q :], v[: v.shape[0] - q]], axis=0)


def _row_rotate_up(v, q):
    """sh[r] = v[r + q] (wrapped; callers mask wrapped rows)."""
    return jnp.concatenate([v[q:], v[:q]], axis=0)


def _flat_shift_right(v, step):
    """Flattened-order: position p takes p - step, for static step < LANE."""
    prv = _row_rotate_down(v, 1)
    return jnp.concatenate(
        [prv[:, LANE - step :], v[:, : LANE - step]], axis=1
    )


def _flat_shift_left(v, step):
    """Flattened-order: position p takes p + step, for static step < LANE."""
    nxt = _row_rotate_up(v, 1)
    return jnp.concatenate([v[:, step:], nxt[:, :step]], axis=1)


def _seg_flat_prefix(x, rows_per_block):
    """Inclusive prefix sum over flattened order, SEGMENTED per sub-block
    (every rows_per_block rows restart); masks are static."""
    ROWS = rows_per_block
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


def _align_windows(stv, rem_vec):
    """One batched alignment pass: every WROWS-row window in the stack is
    flat-shifted LEFT by its own remainder (0..1023), encoded per-row in
    rem_vec.  Rows >= ROWS of each window become garbage (never read).

    ``stv`` stays int8 end to end: int8 selects under i32-derived masks
    compile on this toolchain (scripts/probe_kfeat_tpu.py) and move 4x
    less VPU data per pass than the former widen-to-i32 formulation."""
    for k in range(9, -1, -1):
        step = 1 << k
        if step >= LANE:
            sh = _row_rotate_up(stv, step // LANE)
        else:
            sh = _flat_shift_left(stv, step)
        stv = jnp.where((rem_vec & step) != 0, sh, stv)
    return stv


def _expand(insm32, aligned, rows_per_block):
    """out[p] = insmap[p]-1 at insertion positions, else old[p - c(p)]
    where c = per-block inclusive insertion-count prefix.  The gather runs
    as log2(B) conditional static shifts over the bits of c, high to low;
    valid because c is non-decreasing with slope <= 1 within a block (see
    module docstring).

    ``aligned`` is int8 and the shifted value path stays int8 (4x less
    VPU data per pass); only the mask arithmetic (c) runs in i32."""
    ROWS = rows_per_block
    is_ins = insm32 != 0
    c = _seg_flat_prefix(jnp.where(is_ins, 1, 0).astype(I32), ROWS)
    v = aligned
    rowb = jax.lax.broadcasted_iota(I32, (SROWS, 1), 0) % ROWS
    lane = jax.lax.broadcasted_iota(I32, (SROWS, LANE), 1)
    nbits = (ROWS * LANE).bit_length() - 1
    for k in range(nbits - 1, -1, -1):
        step = 1 << k
        if step >= LANE:
            sh = _row_rotate_down(v, step // LANE)
            ok = rowb >= (step // LANE)  # source row stays in this block
        else:
            sh = _flat_shift_right(v, step)
            ok = (rowb > 0) | (lane >= step)
        v = jnp.where(((c & step) != 0) & ok, sh, v)
    return jnp.where(is_ins, (insm32 - 1).astype(jnp.int8), v)


def _counts_bitplane(out32):
    """Per-row counts of symbols 0..5 in THREE f32 MXU dots via bit-plane
    field encodes.

    WARNING (round-4 hardware finding): Mosaic MXU dots evaluate f32 in
    bf16 by default, so only 0/1 indicator operands are exact on REAL
    hardware — these multi-bit field encodes (values up to 2^16) get
    rounded there while interpret mode stays exact.  Kept ONLY for the
    counts-impl A/B knob (ROPEBWT2_TPU_KCOUNTS=bitplane, measured: counts
    are overlap-free anyway); never enable it for real builds."""
    srows = out32.shape[0]
    b0 = out32 & 1
    b1 = (out32 >> 1) & 1
    b2 = (out32 >> 2) & 1
    enc1 = (b0 + (b1 << 8) + (b2 << 16)).astype(jnp.float32)
    p01 = b0 & b1
    p12 = b1 & b2  # symbol 6 = PAD (garbage region); needed to correct n2/n4
    p02 = b0 & b2
    z = jnp.where(out32 == 0, 1, 0)
    enc2 = (p01 + (p02 << 8) + (z << 16)).astype(jnp.float32)
    enc3 = p12.astype(jnp.float32)
    ones_row = jnp.ones((1, LANE), jnp.float32)

    def dot(e):
        return jax.lax.dot_general(
            ones_row, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(I32)  # (1, SROWS)

    d1, d2, d3 = dot(enc1), dot(enc2), dot(enc3)
    s0, s1, s2 = d1 & 255, (d1 >> 8) & 255, d1 >> 16
    n3, n5, n0 = d2 & 255, (d2 >> 8) & 255, d2 >> 16
    n6 = d3
    n1 = s0 - n3 - n5
    n2 = s1 - n3 - n6
    n4 = s2 - n5 - n6
    cnt = jnp.concatenate(
        [n0, n1, n2, n3, n4, n5, jnp.zeros((2, srows), I32)], axis=0
    )
    return cnt


def _merge_body_fused(bsz, start_ref, old_hbm, ins_hbm, out_ref, cnt_ref,
                      oldA, oldB, insA, insB, outA, outB, cntA, cntB,
                      oldshare, inshare, stackv, insstackv, sems):
    """Fused-ladder variant: the window-misalignment correction (10 static
    shifts) and the insertion expand (12-13 static shifts) collapse into
    ONE conditional-shift ladder over the stacked windows, with shift
    distance u = c + (1024 - rem) in [1, B + 1024] — both components ride
    the same bits.  Valid for the same reason as each ladder alone: u is
    non-decreasing within a window with slope <= 1 (c is a segmented
    prefix, rem is constant per window), so processing bits high-to-low
    with window-containment masks reconstructs out[p] = old[p - c(p)]
    shifted into alignment.  Counts use the 2-dot bit-plane encode."""
    ROWS, WROWS, SUPER, STACK_ROWS = _geom(bsz)
    B = bsz
    nb_static = (old_hbm.shape[0] - PAD_ROWS) // ROWS
    nsb = start_ref[nb_static + 1]

    def in_copies(sb, slot):
        rowq_s, _ = _window_scalars(start_ref, sb, B, SUPER)
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

    def cnt_copy(sb, slot):
        cntv = cntA if slot == 0 else cntB
        return pltpu.make_async_copy(
            cntv, cnt_ref.at[pl.ds(sb * 8, 8), :], sems.at[6 + slot]
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
        rowq_s, b0 = _window_scalars(start_ref, sb, B, SUPER)

        for slot in (0, 1):
            oldv, insv = (oldA, insA) if slot == 0 else (oldB, insB)

            @pl.when((sb % 2) == slot)
            def _():
                a, b = in_copies(sb, slot)
                a.wait()
                b.wait()
                oldshare[...] = oldv[...]
                inshare[...] = insv[...]

        @pl.when(sb + 1 < nsb)
        def _():
            start_in(sb + 1)

        # stack the windows and restack the insertion map at +8 rows (the
        # 1024-symbol alignment offset the fused ladder shifts against)
        rems = []
        insstackv[...] = jnp.zeros((STACK_ROWS, LANE), jnp.int8)
        for j in range(SUPER):
            b = b0 + j
            s = start_ref[b]
            rowq_j = pl.multiple_of(
                (b * (B // (8 * LANE))
                 - (s + 8 * LANE - 1) // (8 * LANE)) * 8, 8
            )
            off = pl.multiple_of(rowq_j - rowq_s, 8)
            rems.append((8 * LANE - (s & (8 * LANE - 1))) & (8 * LANE - 1))
            stackv[j * WROWS : (j + 1) * WROWS, :] = oldshare[
                pl.ds(off, WROWS), :
            ]
            insstackv[j * WROWS + 8 : (j + 1) * WROWS, :] = inshare[
                j * ROWS : (j + 1) * ROWS, :
            ]
        srow = jax.lax.broadcasted_iota(I32, (STACK_ROWS, 1), 0) // WROWS
        rem_vec = jnp.zeros((STACK_ROWS, 1), I32)
        for j in range(SUPER):
            rem_vec = jnp.where(srow == j, rems[j], rem_vec)

        insm32 = insstackv[...].astype(I32)
        is_ins = insm32 != 0
        c = _seg_flat_prefix(jnp.where(is_ins, 1, 0).astype(I32), WROWS)
        u = c + (8 * LANE - rem_vec)  # in [1, B + 1024]

        v = stackv[...]
        rowb = jax.lax.broadcasted_iota(I32, (STACK_ROWS, 1), 0) % WROWS
        lane = jax.lax.broadcasted_iota(I32, (STACK_ROWS, LANE), 1)
        nbits = (WROWS * LANE - 1).bit_length()
        for k in range(nbits - 1, -1, -1):
            step = 1 << k
            if step >= WROWS * LANE:
                continue
            if step >= LANE:
                sh = _row_rotate_down(v, step // LANE)
                ok = rowb >= (step // LANE)
            else:
                sh = _flat_shift_right(v, step)
                ok = (rowb > 0) | (lane >= step)
            v = jnp.where(((u & step) != 0) & ok, sh, v)
        outst = jnp.where(is_ins, (insm32 - 1).astype(jnp.int8), v)

        # compact: output rows are the +8-row band of each window
        out = jnp.concatenate(
            [outst[j * WROWS + 8 : (j + 1) * WROWS] for j in range(SUPER)],
            axis=0,
        )

        # counts via 0/1-indicator dots — exact under Mosaic's default
        # bf16 MXU evaluation (multi-bit encodes are NOT; see
        # _counts_bitplane's warning)
        out32c = out.astype(I32)
        ones_row = jnp.ones((1, LANE), jnp.float32)
        crows = []
        for sidx in range(NSYM):
            ind = (out32c == sidx).astype(jnp.float32)
            crows.append(jax.lax.dot_general(
                ones_row, ind, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        crows.append(jnp.zeros((2, SROWS), jnp.float32))
        cnt = jnp.concatenate(crows, axis=0).astype(I32)

        for slot in (0, 1):
            outv = outA if slot == 0 else outB
            cntv = cntA if slot == 0 else cntB

            @pl.when(((sb % 2) == slot) & (sb >= 2))
            def _():
                out_copy(sb - 2, slot).wait()
                cnt_copy(sb - 2, slot).wait()

            @pl.when((sb % 2) == slot)
            def _():
                outv[...] = out
                cntv[...] = cnt
                out_copy(sb, slot).start()
                cnt_copy(sb, slot).start()

        return 0

    jax.lax.fori_loop(0, nsb, super_body, 0)

    for back in (2, 1):
        @pl.when(nsb >= back)
        def _():
            sb = nsb - back
            for slot in (0, 1):
                @pl.when((sb % 2) == slot)
                def _():
                    out_copy(sb, slot).wait()
                    cnt_copy(sb, slot).wait()


def _merge_kernel_fused(bsz, start_ref, old_hbm, ins_hbm, *refs):
    with jax.enable_x64(False):
        _merge_body_fused(bsz, start_ref, old_hbm, ins_hbm, *refs)


def _window_scalars(start_ref, sb, bsz, superb):
    """(rowq_s, b0) for super-block sb.

    All scalar arithmetic stays in ROW units so the kernel is correct for
    capacities past 2^31 symbols (Mosaic is 32-bit; symbol-unit products
    like b0*bsz overflow there): with s = start_ref[b0] <= M,
    floor((b0*bsz - s) / 1024) == b0*(bsz//1024) - ceil(s/1024)."""
    b0 = sb * superb
    s = start_ref[b0]
    rowq_s = pl.multiple_of(
        (b0 * (bsz // (8 * LANE)) - (s + 8 * LANE - 1) // (8 * LANE)) * 8, 8
    )
    return rowq_s, b0


def _merge_kernel(bsz, start_ref, old_hbm, ins_hbm, *refs):
    with jax.enable_x64(False):
        _merge_body(bsz, start_ref, old_hbm, ins_hbm, *refs)


def _merge_body(bsz, start_ref, old_hbm, ins_hbm, out_ref, cnt_ref,
                oldA, oldB, insA, insB, outA, outB, cntA, cntB,
                oldshare, inshare, stackv, sems):
    ROWS, WROWS, SUPER, STACK_ROWS = _geom(bsz)
    B = bsz
    cap_rows = old_hbm.shape[0] - PAD_ROWS
    nb_static = cap_rows // ROWS
    nsb = start_ref[nb_static + 1]  # active super-blocks (dynamic)

    def in_copies(sb, slot):
        rowq_s, _ = _window_scalars(start_ref, sb, B, SUPER)
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

    def cnt_copy(sb, slot):
        cntv = cntA if slot == 0 else cntB
        return pltpu.make_async_copy(
            cntv, cnt_ref.at[pl.ds(sb * 8, 8), :], sems.at[6 + slot]
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
        rowq_s, b0 = _window_scalars(start_ref, sb, B, SUPER)

        # wait this super-block's inputs; copy the live slot into shared
        # scratch under its parity guard (never read the opposite slot —
        # it is the in-flight DMA destination for sb+1)
        for slot in (0, 1):
            oldv, insv = (oldA, insA) if slot == 0 else (oldB, insB)

            @pl.when((sb % 2) == slot)
            def _():
                a, b = in_copies(sb, slot)
                a.wait()
                b.wait()
                oldshare[...] = oldv[...]
                inshare[...] = insv[...]

        @pl.when(sb + 1 < nsb)
        def _():
            start_in(sb + 1)

        # stage 1: stack the 32 windows (int8, no widening), then one
        # batched misalignment-correcting shift pass
        rems = []
        for j in range(SUPER):
            b = b0 + j
            s = start_ref[b]
            # row-unit arithmetic (see _window_scalars): old_start = b*B - s
            rowq_j = pl.multiple_of(
                (b * (B // (8 * LANE))
                 - (s + 8 * LANE - 1) // (8 * LANE)) * 8, 8
            )
            off = pl.multiple_of(rowq_j - rowq_s, 8)
            # rem = old_start - rowq_j*LANE = (-s) mod 1024
            rems.append((8 * LANE - (s & (8 * LANE - 1))) & (8 * LANE - 1))
            stackv[j * WROWS : (j + 1) * WROWS, :] = oldshare[
                pl.ds(off, WROWS), :
            ]
        srow = jax.lax.broadcasted_iota(I32, (STACK_ROWS, 1), 0) // WROWS
        rem_vec = jnp.zeros((STACK_ROWS, 1), I32)
        for j in range(SUPER):
            rem_vec = jnp.where(srow == j, rems[j], rem_vec)
        stv = _align_windows(stackv[...], rem_vec)
        aligned = jnp.concatenate(
            [stv[j * WROWS : j * WROWS + ROWS] for j in range(SUPER)],
            axis=0,
        )

        # stage 2: expand (int8 values, i32 masks)
        insm32 = inshare[...].astype(I32)
        out = _expand(insm32, aligned, ROWS)

        # stage 3: per-row symbol counts.  Impl selected at TRACE time:
        # "6dot" = one MXU ones-contraction per symbol (original);
        # "bitplane" = 3 dots over bit-plane encodes (_counts_bitplane);
        # "none" = zeros (probe-only: isolates the count stage's cost).
        import os as _os

        _cimpl = _os.environ.get("ROPEBWT2_TPU_KCOUNTS", "6dot")
        if _cimpl == "none":
            cnt = jnp.zeros((8, SROWS), I32)
        elif _cimpl == "bitplane":
            cnt = _counts_bitplane(out.astype(I32))
        else:
            out32 = out.astype(I32)
            ones_row = jnp.ones((1, LANE), jnp.float32)
            crows = []
            for sidx in range(NSYM):
                ind = (out32 == sidx).astype(jnp.float32)
                crows.append(
                    jax.lax.dot_general(
                        ones_row, ind,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # (1, SROWS)
            crows.append(jnp.zeros((2, SROWS), jnp.float32))
            cnt = jnp.concatenate(crows, axis=0).astype(I32)

        for slot in (0, 1):
            outv = outA if slot == 0 else outB
            cntv = cntA if slot == 0 else cntB

            @pl.when(((sb % 2) == slot) & (sb >= 2))
            def _():
                out_copy(sb - 2, slot).wait()  # free the slot
                cnt_copy(sb - 2, slot).wait()

            @pl.when((sb % 2) == slot)
            def _():
                outv[...] = out
                cntv[...] = cnt
                out_copy(sb, slot).start()
                cnt_copy(sb, slot).start()

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
                    cnt_copy(sb, slot).wait()


def _fused_default():
    import os

    return os.environ.get("ROPEBWT2_TPU_KFUSED", "0") == "1"


@functools.partial(jax.jit,
                   static_argnames=("K", "interpret", "block", "fused"))
def merge_pallas(bwt, pos, sym, stream, valid, n=None, *, K,
                 interpret=False, block=None, fused=None):
    """Apply one round's insertions; returns (new_bwt, blk_prefix int32).

    ``bwt`` is the slack-carrying allocation (cap + PAD_ROWS*LANE int8
    symbols, flat.py layout); logical capacity cap = len - PAD_ROWS*LANE.
    ``n`` (current content size) bounds the work to the live prefix:
    blocks past n + #insertions are left untouched/uninitialized (their
    garbage is never read — queries stay below n and table prefixes only
    accumulate upward).

    pos/stream int[M] (old-coord insertion points + tie ranks, int32 or
    int64); sym int32[M]; valid bool[M].  Requires cap % (SUPER*B) == 0
    (multiples of 131072), cap < 2^37 (in-kernel scalars are 32-bit ROW
    units), K % LANE == 0.  The returned rank prefix is int32 while cap
    fits, int64 beyond (flat.table_dtype)."""
    cap_alloc = bwt.shape[0]
    cap = cap_alloc - PAD_ROWS * LANE
    m = pos.shape[0]
    bsz = block or pick_block(cap)  # block: test override for coarse geometries
    nb = cap // bsz
    cap_rows = cap // LANE
    assert cap % SUPER_B == 0 and cap_rows < (1 << 30)
    assert K % LANE == 0 and (PAD_ROWS * LANE) % K == 0

    pdt = pos.dtype
    dest = pos + stream  # new-coordinate destinations, strictly increasing
    trash = jnp.asarray(cap, pdt)
    dest_masked = jnp.where(valid, dest, trash)

    # insmap[d] = sym+1 at insertion destinations, else 0
    insmap = jnp.zeros((cap,), jnp.int8)
    insmap = insmap.at[dest_masked].set(
        (sym + 1).astype(jnp.int8), mode="drop", unique_indices=True
    )

    # per-block insertion-count prefix: count insmap marks per block with a
    # block-row reduction (one sequential cap-sized pass) instead of a
    # second M-sized scatter-add — scatters cost ~ms at these M
    blk_cnts = jnp.sum(
        (insmap != 0).reshape(nb, bsz), axis=1, dtype=I32
    )
    start_ins = jnp.concatenate(
        [jnp.zeros(1, I32), cumsum_blocked(blk_cnts)]
    )
    if n is None:
        nsb_active = jnp.asarray(cap // SUPER_B, I32)
    else:
        total = n.astype(jnp.int64) + start_ins[-1].astype(jnp.int64)
        nsb_active = jnp.minimum(
            (total + SUPER_B - 1) // SUPER_B, cap // SUPER_B
        ).astype(I32)
    start_ins = jnp.concatenate([start_ins, nsb_active[None]])

    _, wrows, _, stack_rows = _geom(bsz)
    nsb_total = cap_rows // SROWS
    if fused is None:
        fused = _fused_default()
    scratch = [
        pltpu.VMEM((SWROWS, LANE), jnp.int8),  # oldA
        pltpu.VMEM((SWROWS, LANE), jnp.int8),  # oldB
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # insA
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # insB
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # outA
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # outB
        pltpu.VMEM((8, SROWS), I32),  # cntA
        pltpu.VMEM((8, SROWS), I32),  # cntB
        pltpu.VMEM((SWROWS, LANE), jnp.int8),  # oldshare
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # inshare
        pltpu.VMEM((stack_rows, LANE), jnp.int8),  # stackv
    ]
    if fused:
        scratch.append(pltpu.VMEM((stack_rows, LANE), jnp.int8))  # insstackv
    scratch.append(pltpu.SemaphoreType.DMA((8,)))
    kern = _merge_kernel_fused if fused else _merge_kernel
    new_bwt, cnt_out = pl.pallas_call(
        functools.partial(kern, bsz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # start_ins
            pl.BlockSpec(memory_space=pl.ANY),  # old bwt (rows, 128)
            pl.BlockSpec(memory_space=pl.ANY),  # insmap (rows, 128)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + PAD_ROWS, LANE), jnp.int8),
            jax.ShapeDtypeStruct((nsb_total * 8, SROWS), I32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(start_ins, bwt.reshape(cap_rows + PAD_ROWS, LANE),
      insmap.reshape(cap_rows, LANE))
    new_bwt = new_bwt.reshape(cap_alloc)

    # counts -> K-block rank prefix (int32 while every count fits, int64
    # past cap 2^31 — flat.table_dtype).  Rows past the live prefix are
    # garbage; the cumsum only pollutes rows past n, which are never read.
    from .flat import table_dtype

    tdt = table_dtype(cap)
    rows6 = jnp.transpose(
        cnt_out.reshape(nsb_total, 8, SROWS)[:, :NSYM, :], (0, 2, 1)
    ).reshape(cap_rows, NSYM)
    kk = K // LANE
    blk_cnt = (
        rows6 if kk == 1
        else rows6.reshape(cap_rows // kk, kk, NSYM).sum(axis=1, dtype=I32)
    )
    blk_prefix = jnp.concatenate(
        [
            jnp.zeros((1, NSYM), tdt),
            cumsum_blocked(blk_cnt.astype(tdt)),
            jnp.zeros(((PAD_ROWS * LANE) // K, NSYM), tdt),
        ]
    )
    return new_bwt, blk_prefix

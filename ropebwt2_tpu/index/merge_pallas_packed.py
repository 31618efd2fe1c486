"""Pallas TPU merge kernel on 4-bit packed storage (index/packed.py).

Same algorithm as merge_pallas.py's fused-ladder variant (one conditional
static-shift chain implementing out[p] = old[p - c(p)] plus window
alignment), but the BWT data never leaves its packed representation: a
packed row holds TWO symbol rows (low nibbles = even symbol row, high =
odd — the vertical plane-pair layout), so every DMA and every ladder data
pass moves HALF the bytes of the int8 kernel.  Only the mask arithmetic
(the insertion-count prefix c and the shift-distance bit tests) is
duplicated per plane.

Plane algebra used throughout (q = symbol-row shift, m = q // 2):
* even q: packed-row rotate by m — planes unaffected;
* odd  q: lo'(r) = hi(r - m - 1), hi'(r) = lo(r - m) — two packed-row
  rotates plus nibble swaps, all static per ladder pass;
* lane shifts (< 128 symbols) act within symbol rows, hence within one
  nibble plane: identical shift applied to both planes of the packed
  word simultaneously (the nibble fields never cross).

Counts stream out as (16, SROWSP) per super-block — 8 rows of low-plane
counts then 8 of high — and are interleaved to symbol-row order OUTSIDE
the kernel (XLA reshapes are free there; Mosaic cannot interleave rows).

Geometry: window alignment is 16 SYMBOL rows (8 packed rows — the DMA
sublane granularity), so the fused shift distance is
u = c + (2048 - rem) in [1, B + 2048].

Capacity contract: cap % SUPER_B == 0, packed rows < 2^30 (row-unit
scalars), K = 128 (one table row per symbol row; the two-level table is
built outside from the streamed counts).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import NSYM
from .scan import cumsum_blocked

LANE = 128
SUPER_B = 131072  # symbols per DMA round trip (shared with the int8 kernel)
SROWS = SUPER_B // LANE  # symbol rows per super-block (1024)
SROWSP = SROWS // 2  # packed rows per super-block (512)
SWROWSP = SROWSP + 16  # super window in packed rows (alignment + edge slack)
PPAD_ROWS = 16  # permanent packed-row tail slack on the allocation
ALIGN = 2048  # window alignment in symbols (16 symbol rows, 8 packed rows)
I32 = jnp.int32
I64 = jnp.int64


def pick_block_packed(cap: int) -> int:
    b = 4096
    while cap // b + 2 > (1 << 17):
        b *= 2
    return b


def _geom_p(b: int):
    """(prows, wprows, super, stack_prows) for expand-block size b."""
    prows = b // (2 * LANE)  # packed rows per block
    return prows, prows + 8, SUPER_B // b, SUPER_B // b * (prows + 8)


def _rot_down(v, q):
    """packed-row rotate: sh[r] = v[r - q] (wrapped; callers mask)."""
    if q == 0:
        return v
    return jnp.concatenate([v[v.shape[0] - q :], v[: v.shape[0] - q]], axis=0)


def _lane_shift_right(v, step):
    """within-symbol-row shift by step (< 128) lanes: position j takes
    j - step; row boundary feeds from the PREVIOUS SYMBOL row = the other
    plane, handled by the caller via the plane algebra — here we only
    shift lanes with the previous packed row's lanes wrapping in, which is
    correct for the SAME plane (previous symbol row of the same parity is
    2 rows back = previous packed row)."""
    prv = _rot_down(v, 1)
    return jnp.concatenate([prv[:, LANE - step :], v[:, : LANE - step]],
                           axis=1)


def _shift_syms(v32, q):
    """Packed (rows, 128) i32 (nibble pairs) shifted DOWN by q symbol ROWS
    (i.e. target symbol row t takes symbol row t - q).  Returns the packed
    result; wrapped rows are garbage (masked by callers)."""
    if q % 2 == 0:
        return _rot_down(v32, q // 2)
    m = q // 2
    a = _rot_down(v32, m + 1)  # provides hi(r - m - 1)
    b = _rot_down(v32, m)  # provides lo(r - m)
    return ((a >> 4) & 0xF) | ((b & 0xF) << 4)


def _shift_lanes_packed(v32, step):
    """Shift by step (< 128) SYMBOLS: within symbol rows, both planes
    shift identically; lane wrap for plane p comes from the same plane of
    the previous SYMBOL row, i.e. the OTHER plane boundary — lo wraps from
    the previous packed row's hi, hi wraps from the SAME packed row's lo.
    """
    lo = v32 & 0xF
    hi = (v32 >> 4) & 0xF
    prv_hi = _rot_down(hi, 1)
    lo_sh = jnp.concatenate(
        [prv_hi[:, LANE - step :], lo[:, : LANE - step]], axis=1
    )
    hi_sh = jnp.concatenate(
        [lo[:, LANE - step :], hi[:, : LANE - step]], axis=1
    )
    return lo_sh | (hi_sh << 4)


def _window_scalars_p(start_ref, sb, bsz, superb):
    """(prowq_s, b0): packed row start of super-block sb's stacked window,
    16-symbol-row aligned.  Row-unit arithmetic (32-bit legal past 2^31
    symbols): with s = start_ref[b0], floor((b0*bsz - s) / 2048) * 8
    packed rows."""
    b0 = sb * superb
    s = start_ref[b0]
    prowq_s = pl.multiple_of(
        (b0 * (bsz // ALIGN) - (s + ALIGN - 1) // ALIGN) * 8, 8
    )
    return prowq_s, b0


def _merge_kernel_packed(bsz, start_ref, old_hbm, ins_hbm, *refs):
    with jax.enable_x64(False):
        _merge_body_packed(bsz, start_ref, old_hbm, ins_hbm, *refs)


def _merge_body_packed(bsz, start_ref, old_hbm, ins_hbm, out_ref, cnt_ref,
                       oldA, oldB, insA, insB, outA, outB, cntA, cntB,
                       oldshare, inshare, stackv, insstackv, sems):
    PROWS, WPROWS, SUPER, STACK_PROWS = _geom_p(bsz)
    B = bsz
    cap_prows = old_hbm.shape[0] - PPAD_ROWS
    nb_static = cap_prows // PROWS
    nsb = start_ref[nb_static + 1]

    def in_copies(sb, slot):
        prowq_s, _ = _window_scalars_p(start_ref, sb, B, SUPER)
        oldv, insv = (oldA, insA) if slot == 0 else (oldB, insB)
        cp_old = pltpu.make_async_copy(
            old_hbm.at[pl.ds(prowq_s, SWROWSP), :], oldv, sems.at[slot]
        )
        cp_ins = pltpu.make_async_copy(
            ins_hbm.at[pl.ds(sb * SROWSP, SROWSP), :], insv,
            sems.at[2 + slot]
        )
        return cp_old, cp_ins

    def out_copy(sb, slot):
        outv = outA if slot == 0 else outB
        return pltpu.make_async_copy(
            outv, out_ref.at[pl.ds(sb * SROWSP, SROWSP), :], sems.at[4 + slot]
        )

    def cnt_copy(sb, slot):
        cntv = cntA if slot == 0 else cntB
        return pltpu.make_async_copy(
            cntv, cnt_ref.at[pl.ds(sb * 16, 16), :], sems.at[6 + slot]
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
        prowq_s, b0 = _window_scalars_p(start_ref, sb, B, SUPER)

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

        # stack windows (packed) + restack the packed insertion map at the
        # +8-packed-row (2048-symbol) alignment offset
        rems = []
        insstackv[...] = jnp.zeros((STACK_PROWS, LANE), jnp.int8)
        for j in range(SUPER):
            b = b0 + j
            s = start_ref[b]
            prowq_j = pl.multiple_of(
                (b * (B // ALIGN) - (s + ALIGN - 1) // ALIGN) * 8, 8
            )
            off = pl.multiple_of(prowq_j - prowq_s, 8)
            rems.append((ALIGN - (s & (ALIGN - 1))) & (ALIGN - 1))
            stackv[j * WPROWS : (j + 1) * WPROWS, :] = oldshare[
                pl.ds(off, WPROWS), :
            ]
            insstackv[j * WPROWS + 8 : (j + 1) * WPROWS, :] = inshare[
                j * PROWS : (j + 1) * PROWS, :
            ]
        srow = jax.lax.broadcasted_iota(I32, (STACK_PROWS, 1), 0) // WPROWS
        rem_vec = jnp.zeros((STACK_PROWS, 1), I32)
        for j in range(SUPER):
            rem_vec = jnp.where(srow == j, rems[j], rem_vec)

        ins32 = insstackv[...].astype(I32) & 0xFF
        ins_lo = ins32 & 0xF
        ins_hi = (ins32 >> 4) & 0xF
        m_lo = (ins_lo != 0).astype(I32)
        m_hi = (ins_hi != 0).astype(I32)

        # segmented (per window) inclusive prefix of the insertion mask,
        # at symbol granularity, per plane: lane prefixes within symbol
        # rows + a packed-row total chain with the lo->hi in-row carry
        def lane_prefix(x):
            sh = 1
            srows_ = x.shape[0]
            while sh < LANE:
                x = x + jnp.concatenate(
                    [jnp.zeros((srows_, sh), x.dtype), x[:, : LANE - sh]],
                    axis=1,
                )
                sh <<= 1
            return x

        lp_lo = lane_prefix(m_lo)
        lp_hi = lane_prefix(m_hi)
        t_lo = jnp.sum(m_lo, axis=1, keepdims=True)
        t_hi = jnp.sum(m_hi, axis=1, keepdims=True)
        pair_tot = t_lo + t_hi
        row_in_w = jax.lax.broadcasted_iota(
            I32, (STACK_PROWS, 1), 0
        ) % WPROWS
        csum = pair_tot
        sh = 1
        while sh < WPROWS:
            shifted = jnp.concatenate(
                [jnp.zeros((sh, 1), csum.dtype), csum[: STACK_PROWS - sh]],
                axis=0,
            )
            csum = csum + jnp.where(row_in_w >= sh, shifted, 0)
            sh <<= 1
        P_excl = csum - pair_tot  # insertions in earlier packed rows
        c_lo = P_excl + lp_lo  # inclusive at even symbol rows
        c_hi = P_excl + t_lo + lp_hi  # inclusive at odd symbol rows

        u_lo = c_lo + (ALIGN - rem_vec)
        u_hi = c_hi + (ALIGN - rem_vec)

        v = stackv[...].astype(I32) & 0xFF
        lane = jax.lax.broadcasted_iota(I32, (STACK_PROWS, LANE), 1)
        nbits = (WPROWS * 2 * LANE - 1).bit_length()
        for k in range(nbits - 1, -1, -1):
            step = 1 << k
            if step >= WPROWS * 2 * LANE:
                continue
            if step >= LANE:
                q = step // LANE  # symbol-row shift
                sh_v = _shift_syms(v, q)
                # containment: source symbol row >= window start
                ok_lo = (2 * row_in_w) >= q
                ok_hi = (2 * row_in_w + 1) >= q
            else:
                sh_v = _shift_lanes_packed(v, step)
                ok_lo = ((2 * row_in_w) > 0) | (lane >= step)
                ok_hi = jnp.ones_like(ok_lo)  # odd symbol rows never row 0
            take_lo = ((u_lo & step) != 0) & ok_lo
            take_hi = ((u_hi & step) != 0) & ok_hi
            v = (
                jnp.where(take_lo, sh_v & 0xF, v & 0xF)
                | jnp.where(take_hi, sh_v & 0xF0, v & 0xF0)
            )

        out_lo = jnp.where(m_lo != 0, ins_lo - 1, v & 0xF)
        out_hi = jnp.where(m_hi != 0, ins_hi - 1, (v >> 4) & 0xF)
        outp = (out_lo | (out_hi << 4)).astype(jnp.int8)

        out = jnp.concatenate(
            [outp[j * WPROWS + 8 : (j + 1) * WPROWS] for j in range(SUPER)],
            axis=0,
        )

        # counts per plane via 0/1-INDICATOR MXU dots (6 per plane).
        # Mosaic MXU dots evaluate f32 in bf16 by default; only 0/1
        # indicator operands are exact there — multi-bit field encodes
        # (the bit-plane trick) get ROUNDED on hardware while interpret
        # mode stays exact, corrupting the rank tables (round-4 bug).
        # Emitted as (16, SROWSP): rows 0..7 lo-plane (n0..n5 + 2 pad),
        # rows 8..15 hi-plane; interleaved to symbol-row order outside.
        o32 = out.astype(I32) & 0xFF
        ones_row = jnp.ones((1, LANE), jnp.float32)
        cnt_parts = []
        for plane_vals in (o32 & 0xF, (o32 >> 4) & 0xF):
            crows = []
            for sidx in range(NSYM):
                ind = (plane_vals == sidx).astype(jnp.float32)
                crows.append(jax.lax.dot_general(
                    ones_row, ind, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            crows.append(jnp.zeros((2, SROWSP), jnp.float32))
            cnt_parts.append(
                jnp.concatenate(crows, axis=0).astype(I32)
            )
        cnt = jnp.concatenate(cnt_parts, axis=0)  # (16, SROWSP)

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


@functools.partial(jax.jit, static_argnames=("K", "interpret", "block"))
def merge_pallas_packed(pbwt, pos, sym, stream, valid, n=None, *, K=LANE,
                        interpret=False, block=None):
    """Apply one round's insertions on packed storage; returns
    (new_pbwt uint8[cap//2 + slack], blkA int64, blkB int32) — the
    two-level rank tables (index/packed.py layout).

    ``pbwt``: packed allocation of cap//2 + PPAD_ROWS*LANE bytes.
    Requires cap % SUPER_B == 0 and K == 128."""

    cap_alloc_b = pbwt.shape[0]
    cap = (cap_alloc_b - PPAD_ROWS * LANE) * 2
    m = pos.shape[0]
    bsz = block or pick_block_packed(cap)
    nb = cap // bsz
    cap_prows = cap // (2 * LANE)
    assert cap % SUPER_B == 0 and cap_prows < (1 << 30)
    assert K == LANE

    pdt = pos.dtype
    dest = pos + stream
    trash = jnp.asarray(cap, pdt)
    dest_masked = jnp.where(valid, dest, trash)

    # packed insmap: nibble (sym+1) at plane (dest//128)&1 of packed index
    # (dest//256)*128 + dest%128; distinct destinations can share a BYTE
    # only via different planes, so a single scatter-add is exact
    prow = dest_masked // 256
    plane = (dest_masked // LANE) & 1
    pidx = jnp.where(valid, prow * LANE + (dest_masked % LANE),
                     jnp.asarray(cap // 2, pdt))
    val = ((sym + 1) << (4 * plane.astype(I32))).astype(jnp.uint8)
    insmap = jnp.zeros((cap // 2,), jnp.uint8)
    insmap = insmap.at[pidx].add(
        jnp.where(valid, val, 0), mode="drop"
    )

    # per-block insertion-count prefix.  At small caps: count marks in the
    # packed map.  At large caps: an M-sized histogram scatter instead —
    # XLA materializes the bool->int32 reduction operand as a FULL s32
    # copy of the map (2 x 7.5 GB HLO temps at 4 Gsym).
    if cap // 2 > (1 << 28):
        blk_cnts = jnp.zeros((nb,), I32).at[
            jnp.where(valid, dest // bsz, nb).astype(I32)
        ].add(1, mode="drop")
    else:
        ip = insmap.reshape(nb, bsz // 2)
        blk_cnts = (
            jnp.sum((ip & 0xF) != 0, axis=1, dtype=I32)
            + jnp.sum((ip >> 4) != 0, axis=1, dtype=I32)
        )
    start_ins = jnp.concatenate(
        [jnp.zeros(1, I32), cumsum_blocked(blk_cnts)]
    )
    if n is None:
        nsb_active = jnp.asarray(cap // SUPER_B, I32)
    else:
        total = n.astype(I64) + start_ins[-1].astype(I64)
        nsb_active = jnp.minimum(
            (total + SUPER_B - 1) // SUPER_B, cap // SUPER_B
        ).astype(I32)
    start_ins = jnp.concatenate([start_ins, nsb_active[None]])

    _, wprows, _, stack_prows = _geom_p(bsz)
    nsb_total = cap_prows // SROWSP
    new_pbwt, cnt_out = pl.pallas_call(
        functools.partial(_merge_kernel_packed, bsz),
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
            jax.ShapeDtypeStruct((cap_prows + PPAD_ROWS, LANE), jnp.int8),
            jax.ShapeDtypeStruct((nsb_total * 16, SROWSP), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SWROWSP, LANE), jnp.int8),  # oldA
            pltpu.VMEM((SWROWSP, LANE), jnp.int8),  # oldB
            pltpu.VMEM((SROWSP, LANE), jnp.int8),  # insA
            pltpu.VMEM((SROWSP, LANE), jnp.int8),  # insB
            pltpu.VMEM((SROWSP, LANE), jnp.int8),  # outA
            pltpu.VMEM((SROWSP, LANE), jnp.int8),  # outB
            pltpu.VMEM((16, SROWSP), I32),  # cntA
            pltpu.VMEM((16, SROWSP), I32),  # cntB
            pltpu.VMEM((SWROWSP, LANE), jnp.int8),  # oldshare
            pltpu.VMEM((SROWSP, LANE), jnp.int8),  # inshare
            pltpu.VMEM((stack_prows, LANE), jnp.int8),  # stackv
            pltpu.VMEM((stack_prows, LANE), jnp.int8),  # insstackv
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(start_ins,
      pbwt.astype(jnp.int8).reshape(cap_prows + PPAD_ROWS, LANE),
      insmap.astype(jnp.int8).reshape(cap_prows, LANE))
    new_pbwt = new_pbwt.reshape(-1).astype(jnp.uint8)

    # counts -> plane-separated two-level tables.  NO symbol-row
    # interleave: the transposed (nsb, 2, 6, 512) intermediate tile-pads
    # its tiny minor dims ~20x on TPU (a 14.9 GB HLO temp at 4 Gsym);
    # instead extract per-symbol per-plane 1-D streams with strided row
    # slices and let tables_from_plane_counts do the pair algebra.
    from .packed import tables_from_plane_counts

    co = cnt_out.reshape(nsb_total, 16, SROWSP)
    nprows = cap // (2 * LANE)
    lo6 = jnp.stack(
        [co[:, s, :].reshape(-1)[:nprows] for s in range(NSYM)], axis=1
    )
    hi6 = jnp.stack(
        [co[:, 8 + s, :].reshape(-1)[:nprows] for s in range(NSYM)],
        axis=1,
    )
    blkA, blkB = tables_from_plane_counts(lo6, hi6, cap)
    return new_pbwt, blkA, blkB

"""Pallas TPU kernel for pending_add's merge step (index/pending.py).

The XLA formulation pays ~17 log-shift passes over pcap-wide arrays per
round (each an HBM round trip): ~4 ms at pcap 2^21 and linear in pcap —
at Gsym-scale pending capacities (2^23+) it dominates the deferred round.
This kernel runs the SAME insertion-expand ladder VMEM-resident in one
invocation (the merge_pallas.py recipe — single invocation, in-kernel
fori over super-blocks, manual double-buffered DMA; see that module's
docstring for the toolchain restrictions that dictate this shape).

Differences from the BWT merge kernel:

* TWO value planes move together: vp (int32) and psym (int8).
* old rows' vp values additionally gain the number of new rows before
  them: out_vp[p] = old_vp[p - c(p)] + start_new[b] + c_local(p), which
  is exactly the old-row shift s of pending_add's module proof (the
  number of new rows preceding old row i in merged order IS its shift).
  New slots take the pre-scattered (varr, sarr) payloads.
* INF sentinels stay INF via a min() clamp (new-row count < 2^28 slack).

The searchsorted descent, the two narrow M-scatters producing
(varr, sarr), and the small block-table cumsum stay in XLA — they are
M-sized or pcap/128-sized, not the pcap-wide cost center.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import NSYM
from .scan import cumsum_blocked
from .merge_pallas import (
    LANE,
    _flat_shift_right,
    _row_rotate_down,
    _seg_flat_prefix,
)

B = 4096  # slots per expand block
ROWS = B // LANE  # 32
WROWS = ROWS + 8
SUPER = 32
SUPER_B = B * SUPER  # 131072 slots per DMA round trip
SROWS = SUPER_B // LANE  # 1024
SWROWS = SROWS + 16
STACK_ROWS = SUPER * WROWS
PAD_ROWS = 16  # tail slack rows the allocation must carry
I32 = jnp.int32


def _pend_body(start_ref, vp_hbm, ps_hbm, va_hbm, sa_hbm, vout_ref,
               sout_ref, cnt_ref,
               vA, vB, sA, sB, vaA, vaB, saA, saB, voA, voB, soA, soB,
               cntA, cntB, vshare, sshare, vastack, sastack, vstack,
               sstack, sems):
    nb_static = (vp_hbm.shape[0] - PAD_ROWS) // ROWS
    nsb = start_ref[nb_static + 1]
    INF = jnp.asarray((1 << 31) - 1 - (1 << 28), I32)

    def rowq_of(sb):
        b0 = sb * SUPER
        s = start_ref[b0]
        return pl.multiple_of(
            (b0 * (B // (8 * LANE))
             - (s + 8 * LANE - 1) // (8 * LANE)) * 8, 8
        ), b0

    def in_copies(sb, slot):
        rowq_s, _ = rowq_of(sb)
        vv, sv, vav, sav = (
            (vA, sA, vaA, saA) if slot == 0 else (vB, sB, vaB, saB)
        )
        return (
            pltpu.make_async_copy(
                vp_hbm.at[pl.ds(rowq_s, SWROWS), :], vv, sems.at[slot]
            ),
            pltpu.make_async_copy(
                ps_hbm.at[pl.ds(rowq_s, SWROWS), :], sv, sems.at[2 + slot]
            ),
            pltpu.make_async_copy(
                va_hbm.at[pl.ds(sb * SROWS, SROWS), :], vav,
                sems.at[4 + slot]
            ),
            pltpu.make_async_copy(
                sa_hbm.at[pl.ds(sb * SROWS, SROWS), :], sav,
                sems.at[6 + slot]
            ),
        )

    def out_copies(sb, slot):
        vo, so = (voA, soA) if slot == 0 else (voB, soB)
        cv = cntA if slot == 0 else cntB
        return (
            pltpu.make_async_copy(
                vo, vout_ref.at[pl.ds(sb * SROWS, SROWS), :],
                sems.at[8 + slot]
            ),
            pltpu.make_async_copy(
                so, sout_ref.at[pl.ds(sb * SROWS, SROWS), :],
                sems.at[10 + slot]
            ),
            pltpu.make_async_copy(
                cv, cnt_ref.at[pl.ds(sb * 8, 8), :], sems.at[12 + slot]
            ),
        )

    def start_in(sb):
        for slot in (0, 1):
            @pl.when((sb % 2) == slot)
            def _():
                for cp in in_copies(sb, slot):
                    cp.start()

    @pl.when(nsb > 0)
    def _():
        start_in(0)

    def super_body(sb, _):
        rowq_s, b0 = rowq_of(sb)
        for slot in (0, 1):
            vv, sv, vav, sav = (
                (vA, sA, vaA, saA) if slot == 0 else (vB, sB, vaB, saB)
            )

            @pl.when((sb % 2) == slot)
            def _():
                for cp in in_copies(sb, slot):
                    cp.wait()
                vshare[...] = vv[...]
                sshare[...] = sv[...]
                vastack[...] = vav[...]
                sastack[...] = sav[...]

        @pl.when(sb + 1 < nsb)
        def _():
            start_in(sb + 1)

        # stack the 32 block windows of both planes; record remainders
        # and per-block global new-item bases
        rems = []
        bases = []
        for j in range(SUPER):
            b = b0 + j
            s = start_ref[b]
            rowq_j = pl.multiple_of(
                (b * (B // (8 * LANE))
                 - (s + 8 * LANE - 1) // (8 * LANE)) * 8, 8
            )
            off = pl.multiple_of(rowq_j - rowq_s, 8)
            rems.append((8 * LANE - (s & (8 * LANE - 1))) & (8 * LANE - 1))
            bases.append(s)
            vstack[j * WROWS : (j + 1) * WROWS, :] = vshare[
                pl.ds(off, WROWS), :
            ]
            sstack[j * WROWS : (j + 1) * WROWS, :] = sshare[
                pl.ds(off, WROWS), :
            ]
        srow = jax.lax.broadcasted_iota(I32, (STACK_ROWS, 1), 0) // WROWS
        rem_vec = jnp.zeros((STACK_ROWS, 1), I32)
        base_st = jnp.zeros((STACK_ROWS, 1), I32)
        for j in range(SUPER):
            rem_vec = jnp.where(srow == j, rems[j], rem_vec)
            base_st = jnp.where(srow == j, bases[j], base_st)

        # one batched alignment pass over both planes
        stv, sts = vstack[...], sstack[...]
        for k in range(9, -1, -1):
            step = 1 << k
            if step >= LANE:
                q = step // LANE
                shv = jnp.concatenate([stv[q:], stv[:q]], axis=0)
                shs = jnp.concatenate([sts[q:], sts[:q]], axis=0)
            else:
                nxtv = jnp.concatenate([stv[1:], stv[:1]], axis=0)
                shv = jnp.concatenate(
                    [stv[:, step:], nxtv[:, :step]], axis=1
                )
                nxts = jnp.concatenate([sts[1:], sts[:1]], axis=0)
                shs = jnp.concatenate(
                    [sts[:, step:], nxts[:, :step]], axis=1
                )
            take = (rem_vec & step) != 0
            stv = jnp.where(take, shv, stv)
            sts = jnp.where(take, shs, sts)
        va = jnp.concatenate(
            [stv[j * WROWS : j * WROWS + ROWS] for j in range(SUPER)],
            axis=0,
        )
        sa = jnp.concatenate(
            [sts[j * WROWS : j * WROWS + ROWS] for j in range(SUPER)],
            axis=0,
        )

        # expand both planes by the per-block prefix of is_new
        sarr = sastack[...].astype(I32)
        varr = vastack[...]
        is_new = sarr != 0
        c = _seg_flat_prefix(jnp.where(is_new, 1, 0).astype(I32), ROWS)
        v, s8 = va, sa
        rowb = jax.lax.broadcasted_iota(I32, (SROWS, 1), 0) % ROWS
        lane = jax.lax.broadcasted_iota(I32, (SROWS, LANE), 1)
        nbits = (ROWS * LANE).bit_length() - 1
        for k in range(nbits - 1, -1, -1):
            step = 1 << k
            if step >= LANE:
                shv = _row_rotate_down(v, step // LANE)
                shs = _row_rotate_down(s8, step // LANE)
                ok = rowb >= (step // LANE)
            else:
                shv = _flat_shift_right(v, step)
                shs = _flat_shift_right(s8, step)
                ok = (rowb > 0) | (lane >= step)
            take = ((c & step) != 0) & ok
            v = jnp.where(take, shv, v)
            s8 = jnp.where(take, shs, s8)
        # old rows gain the global new-before count; INF stays INF
        bexp = jnp.zeros((SROWS, 1), I32)
        srow_o = jax.lax.broadcasted_iota(I32, (SROWS, 1), 0) // ROWS
        for j in range(SUPER):
            bexp = jnp.where(srow_o == j, bases[j], bexp)
        vold = jnp.minimum(v + bexp + c, INF)
        vout = jnp.where(is_new, varr, vold)
        sout = jnp.where(is_new, (sarr - 1).astype(jnp.int8), s8)

        # per-row symbol counts (0/1-indicator MXU dots: exact in bf16)
        out32 = sout.astype(I32)
        ones_row = jnp.ones((1, LANE), jnp.float32)
        crows = []
        for sidx in range(NSYM):
            ind = (out32 == sidx).astype(jnp.float32)
            crows.append(jax.lax.dot_general(
                ones_row, ind, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        crows.append(jnp.zeros((2, SROWS), jnp.float32))
        cnt = jnp.concatenate(crows, axis=0).astype(I32)

        for slot in (0, 1):
            vo, so = (voA, soA) if slot == 0 else (voB, soB)
            cv = cntA if slot == 0 else cntB

            @pl.when(((sb % 2) == slot) & (sb >= 2))
            def _():
                for cp in out_copies(sb - 2, slot):
                    cp.wait()

            @pl.when((sb % 2) == slot)
            def _():
                vo[...] = vout
                so[...] = sout
                cv[...] = cnt
                for cp in out_copies(sb, slot):
                    cp.start()

        return 0

    jax.lax.fori_loop(0, nsb, super_body, 0)

    for back in (2, 1):
        @pl.when(nsb >= back)
        def _():
            sb = nsb - back
            for slot in (0, 1):
                @pl.when((sb % 2) == slot)
                def _():
                    for cp in out_copies(sb, slot):
                        cp.wait()


def _pend_kernel(*refs):
    with jax.enable_x64(False):
        _pend_body(*refs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pending_merge_pallas(vp, psym, varr, sarr, start_new, nsb_active,
                         *, interpret=False):
    """(new_vp, new_psym, row_counts): apply pre-scattered new items to the
    pending planes.  vp int32[(pcap + PAD_ROWS*LANE)], psym int8 same
    alloc; varr/sarr int32/int8[pcap] hold the new-item payloads at their
    merged slots (sarr = sym+1, 0 elsewhere); start_new int32[pcap//B + 2]
    = exclusive per-B-block prefix of new-item counts, with nsb_active
    appended (the merge_pallas start_ins convention).  Requires
    pcap % SUPER_B == 0.  row_counts is int32[8, pcap//LANE] transposed
    rows-first (8-row groups per super-block like merge_pallas)."""
    alloc = vp.shape[0]
    pcap = alloc - PAD_ROWS * LANE
    assert pcap % SUPER_B == 0, pcap
    cap_rows = pcap // LANE
    nsb_total = cap_rows // SROWS
    start_tab = jnp.concatenate(
        [start_new.astype(I32), nsb_active.astype(I32)[None]]
    )
    scratch = [
        pltpu.VMEM((SWROWS, LANE), I32),  # vA
        pltpu.VMEM((SWROWS, LANE), I32),  # vB
        pltpu.VMEM((SWROWS, LANE), jnp.int8),  # sA
        pltpu.VMEM((SWROWS, LANE), jnp.int8),  # sB
        pltpu.VMEM((SROWS, LANE), I32),  # vaA
        pltpu.VMEM((SROWS, LANE), I32),  # vaB
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # saA
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # saB
        pltpu.VMEM((SROWS, LANE), I32),  # voA
        pltpu.VMEM((SROWS, LANE), I32),  # voB
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # soA
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # soB
        pltpu.VMEM((8, SROWS), I32),  # cntA
        pltpu.VMEM((8, SROWS), I32),  # cntB
        pltpu.VMEM((SWROWS, LANE), I32),  # vshare
        pltpu.VMEM((SWROWS, LANE), jnp.int8),  # sshare
        pltpu.VMEM((SROWS, LANE), I32),  # vastack
        pltpu.VMEM((SROWS, LANE), jnp.int8),  # sastack
        pltpu.VMEM((STACK_ROWS, LANE), I32),  # vstack
        pltpu.VMEM((STACK_ROWS, LANE), jnp.int8),  # sstack
        pltpu.SemaphoreType.DMA((14,)),
    ]
    new_vp, new_ps, cnt = pl.pallas_call(
        _pend_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # start table
            pl.BlockSpec(memory_space=pl.ANY),  # vp rows
            pl.BlockSpec(memory_space=pl.ANY),  # psym rows
            pl.BlockSpec(memory_space=pl.ANY),  # varr rows
            pl.BlockSpec(memory_space=pl.ANY),  # sarr rows
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows + PAD_ROWS, LANE), I32),
            jax.ShapeDtypeStruct((cap_rows + PAD_ROWS, LANE), jnp.int8),
            jax.ShapeDtypeStruct((nsb_total * 8, SROWS), I32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(start_tab, vp.reshape(cap_rows + PAD_ROWS, LANE),
      psym.reshape(cap_rows + PAD_ROWS, LANE),
      varr.reshape(cap_rows, LANE), sarr.reshape(cap_rows, LANE))
    return (
        new_vp.reshape(alloc), new_ps.reshape(alloc),
        cnt,
    )

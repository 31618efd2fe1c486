"""Pallas TPU kernels for the BCR plan phase.

Profiling on the tunneled v5e showed per-op launch overhead (~0.1 ms+) —
not bandwidth — dominating the ~40-op plan pipeline of plan_round
(engine/bcr.py): chained microbenchmarks measure even a single (M,)
elementwise pass at >0.1 ms while the whole round's data movement is worth
microseconds.  These kernels collapse the pipeline into TWO single-
invocation Mosaic kernels plus a handful of XLA ops that cannot move
in-kernel (the payload permutation scatter, the read-buffer gather, the
rank-table gathers):

* ``sort_dest``: counting-sort destinations of every read for the stable
  6-bucket sort (mrope.c:303-310 equivalent).
* ``plan_core``: everything between the permutation and the rank queries —
  group detection, head/tail propagation, start-of-round coordinates,
  per-symbol group combinatorics (P, rank-in-run, before-in-group), the
  global tie rank (stream), activity masking and the packed-state update.

All arrays are int32 in flattened (R, 128) layout (R = M // 128).  Full-M
prefix scans run as 7 lane shift-combines + a log2(R) row-carry scan —
in-VMEM passes cost ~1 us each, vs ~0.1 ms+ per XLA op launch.

Mosaic constraints honored (probed empirically, see index/merge_pallas.py):
single invocation without grid, no gathers/scatters, no 64-bit (bodies
trace under jax.enable_x64(False)), no reduce-to-scalar (totals come from
elementwise prefix+suffix identities), lane reductions to (R, 1) only.

The int64 / small-batch / non-TPU paths keep the XLA plan_round.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import NSYM
from ..oracle import SO_RCLO

LANE = 128
I32 = jnp.int32
IMAX = jnp.iinfo(jnp.int32).max


# ---------------------------------------------------------------------------
# flat-order helpers on (R, 128) planes


def _shift_right1(v, fill):
    """s[i] = v[i-1] in flattened order, s[0] = fill (fill must be a scalar
    the kernel can broadcast)."""
    r = v.shape[0]
    prv = jnp.concatenate([v[r - 1 :], v[: r - 1]], axis=0)
    out = jnp.concatenate([prv[:, LANE - 1 :], v[:, : LANE - 1]], axis=1)
    idx0 = (
        jax.lax.broadcasted_iota(I32, (r, LANE), 0)
        + jax.lax.broadcasted_iota(I32, (r, LANE), 1)
    ) == 0  # row 0 AND lane 0
    return jnp.where(idx0, fill, out)


def _shift_left1(v, fill):
    """s[i] = v[i+1] in flattened order, s[M-1] = fill."""
    r = v.shape[0]
    nxt = jnp.concatenate([v[1:], v[:1]], axis=0)
    out = jnp.concatenate([v[:, 1:], nxt[:, :1]], axis=1)
    islast = (
        (jax.lax.broadcasted_iota(I32, (r, LANE), 0) == r - 1)
        & (jax.lax.broadcasted_iota(I32, (r, LANE), 1) == LANE - 1)
    )
    return jnp.where(islast, fill, out)


def _mscan(x, op, ident, reverse=False, with_total=False):
    """Full-M inclusive prefix (suffix when reverse) combine of a (R, 128)
    plane in flattened order: lane shift-combines within rows, then a
    log2(R) carry scan over per-row totals (computed by a lane reduction,
    never by offset slices feeding axis-0 concats).  with_total=True also
    returns the whole-plane combine as an (R, 1) plane with the total in
    EVERY row — Mosaic cannot broadcast (1, 1) to both sublanes and lanes,
    but (R, 1) broadcasts along lanes only."""
    r = x.shape[0]
    if op == "sum":
        f = lambda a, b: a + b  # noqa: E731
        tot = jnp.sum(x, axis=1, keepdims=True)
    elif op == "max":
        f = jnp.maximum
        tot = jnp.max(x, axis=1, keepdims=True)
    else:
        f = jnp.minimum
        tot = jnp.min(x, axis=1, keepdims=True)

    sh = 1
    while sh < LANE:
        pad = jnp.full((r, sh), ident, x.dtype)
        if reverse:
            x = f(x, jnp.concatenate([x[:, sh:], pad], axis=1))
        else:
            x = f(x, jnp.concatenate([pad, x[:, : LANE - sh]], axis=1))
        sh <<= 1

    carry = tot  # inclusive row-total scan
    sh = 1
    while sh < r:
        pad = jnp.full((sh, 1), ident, x.dtype)
        if reverse:
            carry = f(carry, jnp.concatenate([carry[sh:], pad], axis=0))
        else:
            carry = f(carry, jnp.concatenate([pad, carry[: r - sh]], axis=0))
        sh <<= 1
    pad1 = jnp.full((1, 1), ident, x.dtype)
    if reverse:
        excl = jnp.concatenate([carry[1:], pad1], axis=0)
    else:
        excl = jnp.concatenate([pad1, carry[: r - 1]], axis=0)
    out = f(x, excl)
    if with_total:
        # total in every row: combine the inclusive carry with the
        # opposite-direction exclusive carry (log2(R) extra combines)
        ocarry = tot
        sh = 1
        while sh < r:
            pad = jnp.full((sh, 1), ident, x.dtype)
            if reverse:
                ocarry = f(
                    ocarry, jnp.concatenate([pad, ocarry[: r - sh]], axis=0)
                )
            else:
                ocarry = f(ocarry, jnp.concatenate([ocarry[sh:], pad], axis=0))
            sh <<= 1
        if reverse:
            oexcl = jnp.concatenate([pad1, ocarry[: r - 1]], axis=0)
        else:
            oexcl = jnp.concatenate([ocarry[1:], pad1], axis=0)
        return out, f(carry, oexcl)
    return out


# ---------------------------------------------------------------------------
# kernel 1: counting-sort destinations


def _sort_dest_kernel(pk_ref, dest_ref, key_scr):
    # Mosaic's scoped-vmem allocator does not reuse SSA temporaries across
    # the unrolled bucket loop — persistent planes live in scratch refs and
    # the running bucket base is an (R, 1) column (global total in every
    # row; (1, 1) would need an unsupported both-dims broadcast).
    with jax.enable_x64(False):
        pk = pk_ref[...]
        key_scr[...] = jnp.where(pk < 0, 0, pk & 7)
        dest_ref[...] = jnp.zeros_like(pk)
        base = jnp.zeros((pk.shape[0], 1), I32)
        for b in range(NSYM):
            oh = (key_scr[...] == b).astype(I32)
            csum, total = _mscan(oh, "sum", 0, with_total=True)
            dest_ref[...] = dest_ref[...] + oh * (base + csum - 1)
            base = base + total


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_dest(pk, *, interpret=False):
    """dest[i] = stable counting-sort destination of read i, keyed by its
    current bucket (padding/dead rows key as bucket 0)."""
    m = pk.shape[0]
    r = m // LANE
    out = pl.pallas_call(
        _sort_dest_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, LANE), I32),
        scratch_shapes=[pltpu.VMEM((r, LANE), I32)],
        interpret=interpret,
    )(pk.reshape(r, LANE))
    return out.reshape(m)


# ---------------------------------------------------------------------------
# kernel 2: plan core (post-permutation, pre-rank)


def _plan_core_kernel(em, flags_ref, poff_ref, l_ref, u_ref, pk_ref, sym_ref,
                      gl_ref, gu_ref, ps_ref, st_ref, act_ref, pk2_ref,
                      sy_ref, head_scr, bhead_scr, emsym_scr):
    # Persistent planes live in output/scratch refs and partial results
    # accumulate in place: Mosaic's scoped-vmem allocator does not reuse
    # SSA temporaries across the unrolled symbol loop, so keeping the live
    # SSA set to a few planes is what makes M = 2^17 fit in VMEM.
    with jax.enable_x64(False):
        is_first = flags_ref[0]
        pk = pk_ref[...]
        r = pk.shape[0]

        dead = pk < 0
        c = pk & 7  # 7 on dead rows (two's-complement & like the XLA path)
        inert = dead | ((is_first == 0) & (c == 0))
        active = jnp.logical_not(inert)
        act_ref[...] = active.astype(I32)
        sym = jnp.where(active, sym_ref[...], 0)
        sy_ref[...] = sym
        pk2_ref[...] = jnp.where(active, (pk & ~7) | sym, pk)
        emsym = jnp.zeros_like(pk)
        for s in range(NSYM):
            emsym = jnp.where(sym == s, em[s], emsym)
        emsym_scr[...] = emsym

        idx = (
            jax.lax.broadcasted_iota(I32, (r, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(I32, (r, LANE), 1)
        )
        u = u_ref[...]
        tkey = c * 2 + inert.astype(I32)
        bhead_scr[...] = (
            (idx == 0) | (tkey != _shift_right1(tkey, -1))
        ).astype(I32)
        head_scr[...] = bhead_scr[...] | (
            u != _shift_right1(u, -1)
        ).astype(I32)

        headidx = _mscan(
            jnp.where(head_scr[...] != 0, idx, 0), "max", 0
        )
        bktheadidx = _mscan(
            jnp.where(bhead_scr[...] != 0, idx, 0), "max", 0
        )
        poc = jnp.zeros_like(pk)
        for b in range(NSYM):
            poc = jnp.where(c == b, poff_ref[b], poc)
        # E = headidx - bktheadidx converts stored (progressive) interval
        # coordinates to start-of-round ones
        gl_ref[...] = poc + l_ref[...] - (headidx - bktheadidx)
        gu_ref[...] = poc + u - (headidx - bktheadidx)

        # total inert count, broadcast, without a reduce-to-scalar (Mosaic
        # emits 64-bit ops for those): the scan's row carry gives a (1, 1)
        _, n_inert = _mscan(inert.astype(I32), "sum", 0, with_total=True)
        st_ref[...] = headidx - n_inert
        ps_ref[...] = jnp.zeros_like(pk)

        for s in range(NSYM):
            sym = sy_ref[...]
            oh = ((sym == s) & (act_ref[...] != 0)).astype(I32)
            csum = _mscan(oh, "sum", 0)
            excl = csum - oh
            he = _mscan(
                jnp.where(head_scr[...] != 0, excl, 0), "max", 0
            )
            be = _mscan(
                jnp.where(bhead_scr[...] != 0, excl, 0), "max", 0
            )
            is_tail = _shift_left1(head_scr[...], 1) != 0
            ct = _mscan(
                jnp.where(is_tail, csum, IMAX), "min", IMAX, reverse=True
            )
            mine = (sym == s).astype(I32)
            # P: my-symbol insertions by earlier groups of my bucket;
            # stream accumulates rank-in-run + before-in-group terms
            ps_ref[...] = ps_ref[...] + mine * (he - be)
            st_ref[...] = (
                st_ref[...]
                + mine * (excl - he)
                + jnp.where(emsym_scr[...] > em[s], ct - he, 0)
            )


@functools.partial(jax.jit, static_argnames=("so", "interpret"))
def plan_core(l, u, pk, sym_raw, poff, is_first, *, so, interpret=False):
    """Runs the plan core on the permuted read state.  Returns
    (gL, gU, P_sym, stream, active_i32, pk_new, sym_masked), all (M,) i32.
    ``poff``: int32[6] partition offsets; ``is_first``: traced bool."""
    from .bcr import _insertion_order

    m = l.shape[0]
    r = m // LANE
    em = _insertion_order(so)  # python tuple: baked into the kernel
    flags = jnp.asarray(is_first, dtype=I32).reshape(1)
    shp = jax.ShapeDtypeStruct((r, LANE), I32)
    outs = pl.pallas_call(
        functools.partial(_plan_core_kernel, em),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flags
            pl.BlockSpec(memory_space=pltpu.SMEM),  # poff
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_shape=[shp] * 7,
        scratch_shapes=[pltpu.VMEM((r, LANE), I32)] * 3,
        interpret=interpret,
    )(
        flags,
        poff,
        l.reshape(r, LANE),
        u.reshape(r, LANE),
        pk.reshape(r, LANE),
        sym_raw.reshape(r, LANE),
    )
    return tuple(o.reshape(m) for o in outs)


# ---------------------------------------------------------------------------
# wrapper: full plan phase with the two kernels + the few irreducible XLA ops


def plan_round_tpu(psize, pcounts, reads, buf, d, is_first, rank_fn, *,
                   so, interpret=False):
    """Drop-in replacement for engine.bcr.plan_round on the int32 fast path:
    same outputs, ~5 device ops instead of ~40.  Requires int32 read state
    and M % 1024 == 0 (callers gate via use_pallas_plan)."""
    from ..index.scan import cumsum_small
    from ..oracle import SO_IO
    from .bcr import I64, ReadStates, _insertion_order

    M = reads.l.shape[0]
    ar6 = jnp.arange(NSYM, dtype=I32)

    # ---- stable 6-bucket sort: kernel destinations + ONE payload scatter
    dest = sort_dest(reads.pk, interpret=interpret)
    payload = jnp.stack([reads.l, reads.u, reads.pk], axis=1)
    perm = jnp.zeros((M, 3), I32).at[dest].set(
        payload, unique_indices=True
    )
    l, u, pk = perm[:, 0], perm[:, 1], perm[:, 2]

    # ---- next symbol (the one irreducible gather)
    off = (pk >> 3) * 8
    sym_raw = buf[jnp.clip(off + d, 0, buf.shape[0] - 1)].astype(I32)

    poff = jnp.concatenate(
        [jnp.zeros(1, I64), cumsum_small(psize)[:-1]]
    ).astype(I32)
    gL, gU, P_sym, stream, active_i, pk_new, sym = plan_core(
        l, u, pk, sym_raw, poff, is_first, so=so, interpret=interpret
    )
    active = active_i != 0

    # ---- rank queries + interval update (XLA tail, fuses to a few ops)
    c = pk & 7
    ohc = c[:, None] == ar6[None, :]
    ohf = ohc.astype(jnp.float32)

    def sel_rows(table):  # exact one-hot row select via split-f32 MXU
        lo = jnp.einsum(
            "mb,bs->ms", ohf, (table & 0xFFF).astype(jnp.float32)
        )
        hi = jnp.einsum(
            "mb,bs->ms", ohf, (table >> 12).astype(jnp.float32)
        )
        return (hi.astype(I32) << 12) + lo.astype(I32)

    pprefix = jnp.concatenate(
        [jnp.zeros((1, NSYM), I64), cumsum_small(pcounts, axis=0)[:-1]]
    ).astype(I32)
    pprefix_c = sel_rows(pprefix)
    if so == SO_IO:
        TL = rank_fn(gL) - pprefix_c
        delta = jnp.zeros_like(TL)
    else:
        both = rank_fn(jnp.concatenate([gL, gU]))
        TL = both[:M] - pprefix_c
        delta = both[M:] - both[:M]

    ohp = sym[:, None] == ar6[None, :]
    ohp_i = ohp.astype(I32)
    oh32 = (ohp & active[:, None]).astype(I32)
    em = jnp.asarray(_insertion_order(so), dtype=I32)
    em_lt = (em[None, :] < em[:, None]).astype(I32)
    # emitted-before mask of my own symbol (exact: 0/1 f32 contraction)
    sel_mask = jnp.einsum(
        "ms,st->mt", ohp.astype(jnp.float32), em_lt.astype(jnp.float32)
    ).astype(I32)
    presum = jnp.sum(delta * sel_mask, axis=1, dtype=I32)
    gX = gL + presum  # == poc + X[sym] (gL = poc + L, X[sym] = L + presum)

    tl_s = jnp.sum(TL * ohp_i, axis=1, dtype=I32)
    d_s = jnp.sum(delta * ohp_i, axis=1, dtype=I32)
    bucket_oh = (ohc & active[:, None]).astype(jnp.float32)
    ins_bucket = jnp.einsum(
        "mb,ms->bs", bucket_oh, oh32.astype(jnp.float32)
    ).astype(I64)
    ac_excl = jnp.concatenate(
        [
            jnp.zeros((1, NSYM), I64),
            cumsum_small(pcounts + ins_bucket, axis=0)[:-1],
        ]
    ).astype(I32)
    ac_s = jnp.sum(sel_rows(ac_excl) * ohp_i, axis=1, dtype=I32)
    l_new = tl_s + P_sym + ac_s
    u_new = l_new + d_s
    l = jnp.where(active, l_new, l)
    u = jnp.where(active, u_new, u)
    n_ins = jnp.sum(active.astype(I64))
    new_reads = ReadStates(l=l, u=u, pk=pk_new)
    return new_reads, gX, sym, stream, active, ins_bucket, n_ins

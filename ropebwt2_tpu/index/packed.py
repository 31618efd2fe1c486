"""4-bit packed BWT storage (2 symbols/byte) — the capacity mode.

The reference holds 122 Gbp in 34 GB RAM because its index is run-length
compressed (/root/reference/rle.h:39-75, README.md:36-39).  The flat TPU
buffer at 1 byte/symbol caps a v5e chip near ~2 Gsym once the merge
double-buffer and insertion map are counted; nibble packing halves both
the resident footprint and the HBM traffic of every rank gather and merge
DMA, carrying a single chip to >= 4 Gsym.

Packing layout — VERTICAL PLANE PAIRS at 128-symbol row granularity:

    packed[r, j] = sym[(2r) * 128 + j]  |  sym[(2r+1) * 128 + j] << 4

i.e. the low nibbles of packed row r are symbol row 2r and the high
nibbles are symbol row 2r+1.  Chosen over adjacent-pair packing because a
SYMBOL ROW stays a complete 128-lane vector in one nibble plane: every
lane-dimension operation (rank in-block counts, the merge kernel's lane
shifts, prefix scans) applies per plane unchanged, and extracting a row
costs one shift+mask instead of a lane interleave (which Mosaic cannot
express cheaply).

Rank tables in capacity mode are TWO-LEVEL (the device analogue of rld0's
superblock frame, rld0.c:163-205): an int64 anchor row per 2^24 symbols
plus int32 per-K-block counts relative to the anchor — int64 vector
gathers are ~10x slower on TPU and the anchor level keeps them off the
hot path at any capacity.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import NSYM
from .flat import PAD
from .scan import cumsum_blocked

LANE = 128
ACHUNK = 1 << 24  # symbols per int64 anchor row
PPAD_ROWS = 16  # packed-row tail slack (= merge_pallas_packed.PPAD_ROWS)
I32 = jnp.int32
I64 = jnp.int64


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedFlatBwt:
    """Capacity-mode state: 4-bit packed buffer + two-level rank tables.
    Drop-in sibling of flat.FlatBwt (same n/psize/pcounts bookkeeping);
    the engine branches on the state type at trace time."""

    pbwt: jax.Array  # uint8[cap//2 + PPAD_ROWS*LANE]
    n: jax.Array  # int64 scalar
    psize: jax.Array  # int64[6]
    pcounts: jax.Array  # int64[6,6]
    blkA: jax.Array  # int64[(cap >> 24) + 2, 6] anchor rows
    blkB: jax.Array  # int32[cap//128 + 1, 6] anchor-relative rows

    @property
    def cap(self) -> int:
        return (self.pbwt.shape[0] - PPAD_ROWS * LANE) * 2


PACKED_PAD_BYTE = np.uint8(PAD | (PAD << 4))


def empty_packed_state(cap: int) -> PackedFlatBwt:
    assert cap % 256 == 0
    na = (cap + ACHUNK - 1) // ACHUNK
    return PackedFlatBwt(
        pbwt=jnp.full((cap // 2 + PPAD_ROWS * LANE,), PACKED_PAD_BYTE,
                      dtype=jnp.uint8),
        n=jnp.zeros((), I64),
        psize=jnp.zeros((NSYM,), I64),
        pcounts=jnp.zeros((NSYM, NSYM), I64),
        blkA=jnp.zeros((na + 1, NSYM), I64),
        blkB=jnp.zeros((cap // LANE + 1, NSYM), I32),
    )


@functools.partial(jax.jit, static_argnames=("old_cap", "new_cap"),
                   donate_argnums=(0, 1, 2))
def _grow_packed_arrays(pbwt, blkA, blkB, *, old_cap, new_cap):
    """Extend the packed allocation and its tables.  Every appended table
    row corresponds to a position >= old_cap >= n, which no consumer reads
    (the flat.py garbage contract), and the next merge rebuilds both
    levels from streamed counts — so the extension rows just repeat the
    boundary values."""
    new_p = jnp.concatenate([
        pbwt[: old_cap // 2],
        jnp.full((new_cap // 2 + PPAD_ROWS * LANE - old_cap // 2,),
                 PACKED_PAD_BYTE, jnp.uint8),
    ])
    old_rows = old_cap // LANE + 1
    rows_new = new_cap // LANE + 1
    kept = blkB[:old_rows]
    b_bound = kept[old_rows - 1 : old_rows]
    new_B = jnp.concatenate([
        kept, jnp.broadcast_to(b_bound, (rows_new - old_rows, NSYM))
    ])
    na_new = (new_cap + ACHUNK - 1) // ACHUNK
    old_na = blkA.shape[0]
    a_bound = blkA[old_na - 1 : old_na]
    if na_new + 1 > old_na:
        new_A = jnp.concatenate([
            blkA, jnp.broadcast_to(a_bound, (na_new + 1 - old_na, NSYM))
        ])
    else:
        new_A = blkA[: na_new + 1]
    return new_p, new_A, new_B


def grow_packed_state(state: PackedFlatBwt, new_cap: int) -> PackedFlatBwt:
    assert new_cap % 256 == 0 and new_cap >= state.cap
    if new_cap == state.cap:
        return state
    pbwt, blkA, blkB = _grow_packed_arrays(
        state.pbwt, state.blkA, state.blkB,
        old_cap=state.cap, new_cap=new_cap,
    )
    return PackedFlatBwt(pbwt=pbwt, n=state.n, psize=state.psize,
                         pcounts=state.pcounts, blkA=blkA, blkB=blkB)


@functools.partial(jax.jit, static_argnames=("cap",), donate_argnums=(0,))
def _pack_from_int8(bwt_alloc, *, cap):
    body = jnp.where(bwt_alloc[:cap] > 6, 6, bwt_alloc[:cap])
    packed = pack_bwt(body)
    return jnp.concatenate([
        packed.astype(jnp.uint8),
        jnp.full((PPAD_ROWS * LANE,), PACKED_PAD_BYTE, jnp.uint8),
    ])


def packed_from_flat(state, new_cap: int) -> PackedFlatBwt:
    """Convert an int8 FlatBwt into capacity mode at ``new_cap`` (>= the
    old capacity): pack the buffer, then grow; tables are rebuilt once."""
    assert new_cap % 256 == 0 and new_cap >= state.cap
    pbwt = _pack_from_int8(state.bwt, cap=state.cap)
    blkA, blkB = build_two_level_tables(pbwt, state.cap)
    st = PackedFlatBwt(pbwt=pbwt, n=state.n, psize=state.psize,
                       pcounts=state.pcounts, blkA=blkA, blkB=blkB)
    return grow_packed_state(st, new_cap)


def pack_bwt(sym_flat):
    """int8[N] symbols (N % 256 == 0) -> uint8[N//2] vertical-pair bytes."""
    rows = sym_flat.reshape(-1, 2, LANE).astype(jnp.uint8)
    return (rows[:, 0, :] | (rows[:, 1, :] << 4)).reshape(-1)


def unpack_bwt(packed_flat):
    """uint8[N//2] -> int8[N] symbols (inverse of pack_bwt)."""
    p = packed_flat.reshape(-1, LANE)
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=1).reshape(-1)


def pack_bwt_np(sym_flat):
    rows = sym_flat.reshape(-1, 2, LANE).astype(np.uint8)
    return (rows[:, 0, :] | (rows[:, 1, :] << 4)).reshape(-1)


def unpack_bwt_np(packed_flat):
    p = packed_flat.reshape(-1, LANE)
    out = np.empty((p.shape[0], 2, LANE), np.int8)
    out[:, 0, :] = p & 0xF
    out[:, 1, :] = p >> 4
    return out.reshape(-1)


def build_two_level_tables(packed_flat, cap):
    """(blkA int64[(cap >> 24) + 2, 6], blkB int32[cap//128 + 1, 6]) for
    K = 128: blkB[i] = counts in [anchor_start(i), i*128), blkA[a] =
    absolute counts in [0, a << 24).  Built in 6 single-symbol passes (no
    (cap, 6) bool intermediate)."""
    p = packed_flat[: cap // 2].reshape(-1, LANE)
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    cnts = []
    for s in range(NSYM):
        c_lo = (lo == s).sum(axis=1, dtype=I32)
        c_hi = (hi == s).sum(axis=1, dtype=I32)
        cnts.append(jnp.stack([c_lo, c_hi], axis=1).reshape(-1))
    cnt = jnp.stack(cnts, axis=1)  # (cap//128, 6) per symbol-row counts
    return tables_from_row_counts(cnt, cap)


def tables_from_row_counts(cnt, cap):
    """Two-level tables from per-128-symbol-row counts (int32 (cap//128,6)).

    All wide arrays stay int32: the global inclusive prefix may WRAP past
    2^31, but the relative rows blkB = prefix - anchor_prefix are < 2^24,
    so the modular subtraction recovers them exactly; only the (na+1, 6)
    anchor level (from per-chunk totals, each < 2^24) accumulates in
    int64 — an int64 global cumsum here cost ~3 GB of transients at
    4 Gsym capacities."""
    nrows = cap // LANE
    rpc = ACHUNK // LANE
    csum32 = cumsum_blocked(cnt.astype(I32))  # inclusive, wraps mod 2^32
    full32 = jnp.concatenate([jnp.zeros((1, NSYM), I32), csum32])
    na = (cap + ACHUNK - 1) // ACHUNK
    bnd = jnp.minimum(jnp.arange(na + 1, dtype=I32) * rpc, nrows)
    bnd32 = full32[bnd]  # (na+1, 6) chunk-boundary prefixes (mod 2^32)
    # per-chunk totals are exact after the modular difference (< 2^24)
    from .scan import cumsum_small

    tots = (bnd32[1:] - bnd32[:-1]).astype(I64)
    # cumsum_small: jnp.cumsum's int64 (u32-pair) reduce-window lowering
    # requests pathological scoped VMEM at 4 Gsym capacities (HTTP 500,
    # "should not be possible to run out of scoped vmem")
    anchors = jnp.concatenate(
        [jnp.zeros((1, NSYM), I64), cumsum_small(tots, axis=0)]
    )
    arow = jnp.minimum(
        jnp.arange(nrows + 1, dtype=I32) // rpc, na
    )
    rel = full32 - bnd32[arow]  # modular; true value < 2^24
    return anchors, rel


def rank_global_packed(pbwt, blkA, blkB, pos, K=LANE):
    """Batched 6-symbol rank over the packed buffer with two-level tables.
    K is fixed at 128 (one table row per symbol row).  pos: int[Q],
    0 <= pos <= n.  Returns (Q, 6) int64."""
    assert K == LANE
    blk = (pos // LANE).astype(I32)  # symbol row
    within = (pos % LANE).astype(I32)
    base = blkA[(pos // ACHUNK).astype(I32)] + blkB[blk].astype(I64)
    prow = blk >> 1
    nrp = pbwt.shape[0] // LANE
    rows = pbwt.reshape(-1, LANE)[jnp.clip(prow, 0, nrp - 1)]  # (Q, 128)
    r32 = rows.astype(I32)
    nib = jnp.where(
        (blk & 1)[:, None] == 1, (r32 >> 4) & 0xF, r32 & 0xF
    ).astype(jnp.int8)
    j = jnp.arange(LANE, dtype=I32)
    inmask = j[None, :] < within[:, None]
    sym = jnp.arange(NSYM, dtype=jnp.int8)
    eq = nib[:, :, None] == sym[None, None, :]
    inc = (eq & inmask[:, :, None]).sum(axis=1, dtype=I32)
    return base + inc.astype(I64)


def apply_insertions_packed(pbwt, n, pos, sym, stream, valid):
    """jnp reference merge on packed storage: unpack -> merge -> repack.
    Used on CPU (tests, virtual meshes); the TPU path is the packed Pallas
    kernel (merge_pallas_packed)."""
    from .merge import apply_insertions

    sym_flat = unpack_bwt(pbwt)
    new = apply_insertions(sym_flat, n, pos, sym, stream, valid)
    return pack_bwt(jnp.where(new > 6, 6, new))

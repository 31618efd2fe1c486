"""The Pallas merge kernel (interpret mode) must agree exactly with the jnp
reference merge + table rebuild on the live prefix.

The kernel contract (index/merge_pallas.py): the input buffer carries
PAD_ROWS*LANE = 2048 symbols of tail slack (flat.py allocates it), content
past the live prefix is unspecified on output, and the returned block
prefix is int32 and exact for all boundaries at or below n + #insertions.
"""

import numpy as np
import jax.numpy as jnp

from ropebwt2_tpu.index.flat import PAD_TAIL
from ropebwt2_tpu.index.merge import apply_insertions
from ropebwt2_tpu.index.merge_pallas import merge_pallas
from ropebwt2_tpu.index.rank import build_block_tables


def _mk(rng, cap, n, garbage_tail=False):
    buf = np.full(cap + PAD_TAIL, 6, np.int8)
    buf[:n] = rng.integers(0, 6, n)
    if garbage_tail:  # simulate post-round unspecified content past n
        buf[n:] = rng.integers(-128, 127, cap + PAD_TAIL - n)
    return buf


def _check(rng, bwt, n, pos, sym, stream, valid, K, trial=""):
    jb = jnp.asarray(bwt)
    jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]
    ref = apply_insertions(jb, jnp.asarray(n), *jargs)
    got, got_pref = merge_pallas(
        jb, *jargs, n=jnp.asarray(n), K=K, interpret=True
    )
    lim = n + int(valid.sum())  # content past the live prefix is unspecified
    assert np.array_equal(
        np.asarray(ref)[:lim], np.asarray(got)[:lim]
    ), trial
    limk = lim // K  # exact table rows in the live prefix
    assert got_pref.dtype == jnp.int32
    assert np.array_equal(
        np.asarray(build_block_tables(ref, K))[: limk + 1],
        np.asarray(got_pref)[: limk + 1],
    ), trial


def test_merge_pallas_interpret_matches_reference(rng):
    for trial in range(8):
        CAP, M, K = 131072, 64, 256
        n = int(rng.integers(0, CAP - M))
        bwt = _mk(rng, CAP, n, garbage_tail=trial % 2 == 1)
        A = int(rng.integers(0, M + 1))
        pos = np.sort(rng.integers(0, n + 1, A))
        allpos = np.zeros(M, np.int64)
        allpos[:A] = pos
        sym = np.zeros(M, np.int32)
        sym[:A] = rng.integers(0, 6, A)
        stream = np.zeros(M, np.int64)
        stream[:A] = np.arange(A)
        valid = np.zeros(M, bool)
        valid[:A] = True
        _check(rng, bwt, n, allpos, sym, stream, valid, K, trial)


def test_merge_pallas_k128_and_multi_superblock(rng):
    """K=128 (per-row) tables, multi-super-block offsets (sb>0), and int32
    position dtypes — the exact configuration the engine feeds on TPU."""
    for K, CAP in ((128, 262144), (256, 262144)):
        M = 256
        n = CAP - M - 7
        bwt = _mk(rng, CAP, n)
        pos = np.sort(rng.integers(0, n + 1, M)).astype(np.int32)
        sym = rng.integers(0, 6, M).astype(np.int32)
        stream = np.arange(M, dtype=np.int32)
        valid = np.ones(M, bool)
        _check(rng, bwt, n, pos, sym, stream, valid, K, K)


def test_merge_pallas_dense_insertions(rng):
    """Blocks packed with insertions — the log-shift expand's high bits."""
    CAP, K = 131072, 256
    M = 4096
    n = 1000
    bwt = _mk(rng, CAP, n)
    pos = np.sort(rng.integers(0, 50, M)).astype(np.int64)  # clustered
    sym = rng.integers(0, 6, M).astype(np.int32)
    stream = np.arange(M, dtype=np.int64)
    valid = np.ones(M, bool)
    _check(rng, bwt, n, pos, sym, stream, valid, K)


def test_merge_pallas_fully_dense_block(rng):
    """An entire 4096-symbol block of insertions plus ragged neighbours —
    exercises every bit level of the log-shift including c == B."""
    CAP, K = 131072, 256
    M = 8192
    n = 9000
    bwt = _mk(rng, CAP, n, garbage_tail=True)
    # first 5000 insertions at old position 0 -> output block 0 is
    # entirely insertions (c reaches B); the rest keep blocks 1..3
    # insertion-dominant with odd offsets
    pos = np.sort(
        np.concatenate([np.zeros(5000, np.int32),
                        rng.integers(0, 4000, M - 5000).astype(np.int32)])
    ).astype(np.int32)
    sym = rng.integers(0, 6, M).astype(np.int32)
    stream = np.arange(M, dtype=np.int32)
    valid = np.ones(M, bool)
    _check(rng, bwt, n, pos, sym, stream, valid, K)


def test_merge_pallas_sparse_and_empty(rng):
    CAP, K = 131072, 256
    n = 70000
    bwt = _mk(rng, CAP, n)
    # zero valid insertions
    M = 32
    pos = np.zeros(M, np.int64)
    sym = np.zeros(M, np.int32)
    stream = np.zeros(M, np.int64)
    valid = np.zeros(M, bool)
    _check(rng, bwt, n, pos, sym, stream, valid, K)
    # one insertion at the very end and one at 0
    valid[:2] = True
    pos[:2] = (0, n)
    stream[:2] = (0, 1)
    sym[:2] = (3, 4)
    _check(rng, bwt, n, pos, sym, stream, valid, K)


def test_coarse_block_geometry_interpret():
    """Big capacities shrink the SMEM start table by coarsening the expand
    block (pick_block); exercise the B=8192/16384 geometries in interpret
    mode at a small capacity against the jnp reference merge."""
    import numpy as np
    import jax.numpy as jnp
    from ropebwt2_tpu.index import merge_pallas as mp
    from ropebwt2_tpu.index.merge import apply_insertions

    rng = np.random.default_rng(5)
    cap = 2 * mp.SUPER_B
    m = 4096
    n0 = cap // 2 + 12345
    bwt = np.full(cap + mp.PAD_ROWS * mp.LANE, 6, np.int8)
    bwt[:n0] = rng.integers(0, 6, n0)
    pos = np.sort(rng.integers(0, n0, m)).astype(np.int32)
    sym = rng.integers(0, 6, m).astype(np.int32)
    stream = np.arange(m, dtype=np.int32)
    valid = np.ones(m, bool)
    jb = jnp.asarray(bwt)
    jn = jnp.asarray(n0, jnp.int64)
    ref = np.asarray(apply_insertions(
        jb, jn, jnp.asarray(pos), jnp.asarray(sym), jnp.asarray(stream),
        jnp.asarray(valid)))[: n0 + m]
    for blk in (8192, 16384):
        got, blkp = mp.merge_pallas(
            jb, jnp.asarray(pos), jnp.asarray(sym), jnp.asarray(stream),
            jnp.asarray(valid), n=jn, K=256, interpret=True, block=blk)
        assert np.array_equal(np.asarray(got)[: n0 + m], ref), blk
        # tables must match a fresh scan of the merged prefix
        from ropebwt2_tpu.index.rank import build_block_tables
        want = np.asarray(build_block_tables(got, 256, dtype=jnp.int32))
        nlive = (n0 + m) // 256
        assert np.array_equal(np.asarray(blkp)[:nlive], want[:nlive]), blk


def test_row_unit_scalar_formulas_match_symbol_units():
    """The kernel's >2^31-safe row-unit scalar arithmetic must equal the
    symbol-unit originals for every (block, start_ins) combination,
    including past-2^31 capacities (pure-python bigint oracle)."""
    import numpy as np

    rng = np.random.default_rng(5)
    for bsz in (4096, 8192, 32768, 65536):
        q = bsz // 1024
        for _ in range(200):
            b = int(rng.integers(0, (1 << 33) // bsz))
            s = int(rng.integers(0, 1 << 21))
            old_start = b * bsz - s
            if old_start < 0:
                continue
            rowq_old = (old_start // 1024) * 8
            rem_old = old_start - rowq_old * 128
            rowq_new = (b * q - (s + 1023) // 1024) * 8
            rem_new = (1024 - (s & 1023)) & 1023
            assert rowq_new == rowq_old, (bsz, b, s)
            assert rem_new == rem_old, (bsz, b, s)
            # every 32-bit intermediate of the new formulas stays in range
            for v in (b * q, (s + 1023) // 1024, rowq_new):
                assert -(1 << 31) <= v < (1 << 31), (bsz, b, s, v)


def _check_fused(rng, bwt, n, pos, sym, stream, valid, K, trial=""):
    jb = jnp.asarray(bwt)
    jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]
    ref = apply_insertions(jb, jnp.asarray(n), *jargs)
    got, got_pref = merge_pallas(
        jb, *jargs, n=jnp.asarray(n), K=K, interpret=True, fused=True
    )
    lim = n + int(valid.sum())
    assert np.array_equal(
        np.asarray(ref)[:lim], np.asarray(got)[:lim]
    ), trial
    limk = lim // K
    assert np.array_equal(
        np.asarray(build_block_tables(ref, K))[: limk + 1],
        np.asarray(got_pref)[: limk + 1],
    ), trial


def test_merge_pallas_fused_matches_reference(rng):
    """The fused-ladder kernel variant (align + expand in one conditional
    shift chain, bit-plane counts) must be byte- and table-identical to the
    jnp reference, including dense rounds and garbage tails."""
    for trial in range(6):
        CAP, M, K = 131072, 96, 256
        n = int(rng.integers(1, CAP - M))
        bwt = _mk(rng, CAP, n, garbage_tail=trial % 2 == 1)
        A = int(rng.integers(1, M + 1))
        pos = np.sort(rng.integers(0, n + 1, A))
        allpos = np.zeros(M, np.int64)
        allpos[:A] = pos
        sym = np.zeros(M, np.int32)
        sym[:A] = rng.integers(0, 6, A)
        stream = np.zeros(M, np.int64)
        stream[:A] = np.arange(A)
        valid = np.zeros(M, bool)
        valid[:A] = True
        _check_fused(rng, bwt, n, allpos, sym, stream, valid, K, trial)


def test_merge_pallas_fused_dense_and_multiblock(rng):
    """Fused variant under dense clustered insertions (many per block) and
    a multi-super-block capacity."""
    CAP, M, K = 262144, 512, 128
    n = 200000
    bwt = _mk(rng, CAP, n)
    # cluster insertions into a narrow band to stress in-block expand
    pos = np.sort(rng.integers(140000, 141000, M)).astype(np.int64)
    sym = rng.integers(0, 6, M).astype(np.int32)
    stream = np.arange(M, dtype=np.int64)
    valid = np.ones(M, bool)
    _check_fused(rng, bwt, n, pos, sym, stream, valid, K)

"""The Pallas merge kernel (interpret mode) must agree exactly with the jnp
reference merge + table rebuild."""

import numpy as np
import jax.numpy as jnp

from ropebwt2_tpu.index.merge import apply_insertions
from ropebwt2_tpu.index.merge_pallas import merge_pallas
from ropebwt2_tpu.index.rank import build_block_tables


def test_merge_pallas_interpret_matches_reference(rng):
    for trial in range(8):
        CAP, M, K = 131072, 64, 256
        n = int(rng.integers(0, CAP - M))
        bwt = np.full(CAP, 6, np.int8)
        bwt[:n] = rng.integers(0, 6, n)
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
        jb = jnp.asarray(bwt)
        jargs = [
            jnp.asarray(x) for x in (allpos, sym, stream, valid)
        ]
        ref = apply_insertions(jb, jnp.asarray(n), *jargs)
        got, got_pref = merge_pallas(
            jb, *jargs, n=jnp.asarray(n), K=K, interpret=True
        )
        npref = np.asarray(ref)
        ngot = np.asarray(got)
        lim = n + A  # blocks past the live prefix are untouched
        assert np.array_equal(npref[:lim], ngot[:lim]), trial
        limk = (n + A) // K  # table rows in the live prefix
        assert np.array_equal(
            np.asarray(build_block_tables(ref, K))[: limk + 1],
            np.asarray(got_pref)[: limk + 1],
        ), trial


def test_merge_pallas_k128_fused_counts_and_multi_superblock(rng):
    """The K==128 fused-counts emission, multi-super-block offsets (sb>0),
    and int32 position dtypes — the exact configuration the engine feeds on
    TPU for small capacities."""
    import jax.numpy as jnp

    for K, CAP in ((128, 262144), (256, 262144)):
        M = 256
        n = CAP - M - 7
        bwt = np.full(CAP, 6, np.int8)
        bwt[:n] = rng.integers(0, 6, n)
        A = M
        pos = np.sort(rng.integers(0, n + 1, A)).astype(np.int32)
        sym = rng.integers(0, 6, A).astype(np.int32)
        stream = np.arange(A, dtype=np.int32)
        valid = np.ones(A, bool)
        jb = jnp.asarray(bwt)
        jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]
        ref = apply_insertions(jb, jnp.asarray(n), *jargs)
        got, pref = merge_pallas(
            jb, *jargs, n=jnp.asarray(n, jnp.int32), K=K, interpret=True
        )
        lim = n + A
        assert np.array_equal(np.asarray(ref)[:lim], np.asarray(got)[:lim])
        limk = lim // K
        assert np.array_equal(
            np.asarray(build_block_tables(ref, K))[: limk + 1],
            np.asarray(pref)[: limk + 1],
        ), K


def test_merge_pallas_dense_insertions(rng):
    """Blocks packed with insertions (worst-case t-loop depth)."""
    CAP, K = 131072, 256
    M = 2048
    n = 1000
    bwt = np.full(CAP, 6, np.int8)
    bwt[:n] = rng.integers(0, 6, n)
    pos = np.sort(rng.integers(0, 50, M)).astype(np.int64)  # clustered
    sym = rng.integers(0, 6, M).astype(np.int32)
    stream = np.arange(M, dtype=np.int64)
    valid = np.ones(M, bool)
    jb = jnp.asarray(bwt)
    jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]
    ref = apply_insertions(jb, jnp.asarray(n), *jargs)
    got, _ = merge_pallas(jb, *jargs, K=K, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))

"""Deferred-merge (pending side index) parity tests.

The deferred engine (index/pending.py + bcr_batch_deferred_impl) must be
byte-identical to the merge-every-round engine for every sorting order,
deferral depth, batch shape, and across incremental batches — the same
oracle discipline as the reference's mode equivalences (SURVEY.md §4:
single-string, unthreaded, and threaded modes must produce identical BWTs).
"""

import numpy as np
import pytest

from ropebwt2_tpu.engine import TpuBwt
from ropebwt2_tpu.oracle import SO_IO, SO_RCLO, SO_RLO

from conftest import random_reads


def _build(reads, so, K, defer_r, batches=2):
    eng = TpuBwt(so=so, K=K, defer_r=defer_r)
    step = -(-len(reads) // batches)
    for lo in range(0, len(reads), step):
        eng.insert_multi(reads[lo : lo + step])
    return eng


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
@pytest.mark.parametrize("defer_r", [2, 3, 16])
def test_deferred_matches_direct(rng, so, defer_r):
    reads = random_reads(rng, 120, lo=2, hi=28, with_n=True)
    reads = [np.asarray(r, np.int8) for r in reads]
    want = _build(reads, so, 128, 0).bwt_array()
    got = _build(reads, so, 128, defer_r).bwt_array()
    assert np.array_equal(got, want)


@pytest.mark.parametrize("so", [SO_IO, SO_RLO])
def test_deferred_uniform_packed_path(rng, so):
    # uniform ACGT matrix hits the 2-bit packed minimum-transfer path
    reads = rng.integers(1, 5, size=(200, 23)).astype(np.int8)
    want = _build(reads, so, 128, 0, batches=3).bwt_array()
    got = _build(reads, so, 128, 8, batches=3).bwt_array()
    assert np.array_equal(got, want)


def test_deferred_r_exceeds_rounds(rng):
    # deferral depth beyond the round count: one flush at batch end
    reads = [np.asarray(r, np.int8) for r in random_reads(rng, 40, lo=3, hi=9)]
    want = _build(reads, SO_RLO, 128, 0, batches=1).bwt_array()
    got = _build(reads, SO_RLO, 128, 64, batches=1).bwt_array()
    assert np.array_equal(got, want)


def test_auto_policy_kicks_in(rng):
    # grow the index until the auto policy selects a nonzero R, then keep
    # inserting: output must stay identical to the direct engine
    reads = rng.integers(1, 5, size=(64, 40)).astype(np.int8)
    auto = TpuBwt(so=SO_RLO, K=128, defer_r=-1)
    direct = TpuBwt(so=SO_RLO, K=128, defer_r=0)
    saw_defer = False
    for _ in range(8):
        auto.insert_multi(reads)
        direct.insert_multi(reads)
        r, _ = auto._choose_defer(64)
        saw_defer = saw_defer or r > 0
    assert saw_defer, "auto policy never engaged deferral in this sweep"
    assert np.array_equal(auto.bwt_array(), direct.bwt_array())


def test_deferred_vs_reference(rng, ref_binary):
    from conftest import reads_to_lines, run_ref

    reads = random_reads(rng, 90, lo=4, hi=20)
    lines = reads_to_lines(reads)
    want = run_ref(ref_binary, ["-LRs", "-m", "300"], lines)
    eng = TpuBwt(so=SO_RLO, K=128, defer_r=4)
    eng.insert_multi([np.asarray(r, np.int8) for r in reads])
    lut = np.frombuffer(b"$ACGTN", np.uint8)
    got = lut[eng.bwt_array()].tobytes() + b"\n"
    assert got == want


@pytest.mark.parametrize("n", [256, 1 << 12, 1 << 15, (1 << 15) + 128])
@pytest.mark.parametrize("dtype", [np.int32, np.int64])
def test_searchsorted_blocked_vs_numpy(rng, n, dtype):
    import jax.numpy as jnp

    from ropebwt2_tpu.index.pending import searchsorted_blocked

    inf = np.iinfo(dtype).max - (1 << 28)
    fill = rng.integers(0, n)
    vp = np.full(n, inf, dtype)
    vp[:fill] = np.sort(rng.integers(0, 5 * n, fill)).astype(dtype)
    q = np.concatenate(
        [
            rng.integers(0, 5 * n, 500),
            vp[:fill][rng.integers(0, max(fill, 1), 100)] if fill else [],
            [0, 1, 5 * n, inf - 1],
        ]
    ).astype(dtype)
    got = np.asarray(searchsorted_blocked(jnp.asarray(vp), jnp.asarray(q)))
    want = np.searchsorted(vp, q, side="left")
    assert np.array_equal(got, want)

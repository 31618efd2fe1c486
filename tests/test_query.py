"""Query API: ranks, backward search, and bidirectional extension."""

import numpy as np
import jax.numpy as jnp

from ropebwt2_tpu.engine import TpuBwt
from ropebwt2_tpu.engine.query import backward_search, extend, rank1a, rank2a

from conftest import random_reads


def _build(reads, so=0):
    eng = TpuBwt(so=so, K=16)
    eng.insert_multi(reads)
    return eng


def test_rank_matches_numpy(rng):
    reads = random_reads(rng, n=30, with_n=True)
    eng = _build(reads)
    bwt = eng.bwt_array()
    pos = np.sort(rng.integers(0, len(bwt) + 1, size=40)).astype(np.int64)
    occ = np.asarray(rank1a(eng.state, jnp.asarray(pos), K=16))
    for i, p in enumerate(pos):
        for s in range(6):
            assert occ[i, s] == int((bwt[:p] == s).sum())
    ox, oy = rank2a(eng.state, jnp.asarray(pos), jnp.asarray(pos), K=16)
    assert np.array_equal(np.asarray(ox), np.asarray(oy))


def _count_occurrences(reads, pat):
    pat = list(pat)
    k = len(pat)
    cnt = 0
    for r in reads:
        for i in range(len(r) - k + 1):
            if list(r[i : i + k]) == pat:
                cnt += 1
    return cnt


def test_backward_search_counts(rng):
    reads = random_reads(rng, n=40, lo=8, hi=20)
    eng = _build(reads)
    pats = [list(rng.integers(1, 5, size=int(rng.integers(1, 5)))) for _ in range(25)]
    lmax = max(len(p) for p in pats)
    mat = np.zeros((len(pats), lmax), dtype=np.int32)
    lens = np.zeros(len(pats), dtype=np.int32)
    for i, p in enumerate(pats):
        mat[i, lmax - len(p) :] = p
        lens[i] = len(p)
    lo, hi = backward_search(
        eng.state, jnp.asarray(mat), jnp.asarray(lens), K=16
    )
    for i, p in enumerate(pats):
        want = _count_occurrences(reads, p)
        assert int(hi[i] - lo[i]) == want, (p, int(hi[i] - lo[i]), want)


def test_extend_backward_matches_search(rng):
    """One extend step from the whole-BWT interval == one backward-search
    step: interval of pattern 'a'."""
    reads = random_reads(rng, n=30)
    eng = _build(reads)
    n = eng.n
    ik = jnp.asarray([[0, 0, n]], dtype=jnp.int64)
    ok = np.asarray(extend(eng.state, ik, is_back=True, K=16))[0]
    bwt = eng.bwt_array()
    csum = np.zeros(7, dtype=np.int64)
    for s in range(6):
        csum[s + 1] = csum[s] + int((bwt == s).sum())
    for a in range(6):
        # backward start must be C(a), size must be count(a)
        assert ok[a, 0] == csum[a]
        assert ok[a, 2] == csum[a + 1] - csum[a]
    # sizes of the 6 sub-intervals partition the parent interval
    assert ok[:, 2].sum() == n


def test_extend_forward_symmetry(rng):
    """Forward extension sizes on an RCLO-both-strands index mirror backward
    extension of the complement (the bidirectional FM property)."""
    reads = random_reads(rng, n=20)
    both = []
    for r in reads:
        both.append(r)
        both.append([5 - c if 1 <= c <= 4 else c for c in reversed(r)])
    eng = _build(both)
    n = eng.n
    ik = jnp.asarray([[0, 0, n]], dtype=jnp.int64)
    okb = np.asarray(extend(eng.state, ik, is_back=True, K=16))[0]
    okf = np.asarray(extend(eng.state, ik, is_back=False, K=16))[0]
    # same BWT is used both ways from the root: sizes agree per symbol
    assert np.array_equal(okb[:, 2], okf[:, 2])
    # forward result stores the new interval in x[1]
    assert okf[0, 1] == 0

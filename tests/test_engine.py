"""The JAX engine must produce byte-identical BWTs to the Python oracle (and
hence to the reference binary)."""

import numpy as np
import pytest

from ropebwt2_tpu.alphabet import decode_nt6
from ropebwt2_tpu.engine import TpuBwt
from ropebwt2_tpu.oracle import SO_IO, SO_RCLO, SO_RLO, OracleIndex

from conftest import random_reads


def _oracle_bwt(reads, so, batches=1):
    idx = OracleIndex(so)
    for part in np.array_split(np.arange(len(reads)), batches):
        batch = [list(reversed(reads[i])) for i in part]
        if batch:
            idx.insert_multi(batch)
    return idx.bwt()


def _engine_bwt(reads, so, batches=1, K=16):
    eng = TpuBwt(so=so, K=K)
    for part in np.array_split(np.arange(len(reads)), batches):
        batch = [reads[i] for i in part]
        if batch:
            eng.insert_multi(batch)
    return list(eng.bwt_array())


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
def test_engine_matches_oracle(so, rng):
    for trial in range(6):
        reads = random_reads(rng, n=int(rng.integers(1, 16)), with_n=True)
        got = _engine_bwt(reads, so)
        want = _oracle_bwt(reads, so)
        assert got == want, (
            f"so={so} trial={trial} reads={[decode_nt6(r) for r in reads]}\n"
            f"got  {decode_nt6(got)}\nwant {decode_nt6(want)}"
        )


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
def test_engine_incremental_batches(so, rng):
    for _ in range(3):
        reads = random_reads(rng, n=12, with_n=True)
        assert _engine_bwt(reads, so, batches=3) == _oracle_bwt(reads, so)


def test_engine_single_read(rng):
    for so in (SO_IO, SO_RLO, SO_RCLO):
        reads = random_reads(rng, n=1)
        assert _engine_bwt(reads, so) == _oracle_bwt(reads, so)


def test_engine_empty_and_tiny_reads():
    reads = [[1], [4], [1]]
    for so in (SO_IO, SO_RLO, SO_RCLO):
        assert _engine_bwt(reads, so) == _oracle_bwt(reads, so)


def test_engine_identical_reads(rng):
    reads = [[1, 2, 3, 4]] * 5 + [[2, 2, 2]] * 3
    for so in (SO_IO, SO_RLO, SO_RCLO):
        assert _engine_bwt(reads, so) == _oracle_bwt(reads, so)


def test_engine_larger_random(rng):
    reads = random_reads(rng, n=60, lo=5, hi=40, with_n=True)
    for so in (SO_IO, SO_RLO, SO_RCLO):
        assert _engine_bwt(reads, so, K=64) == _oracle_bwt(reads, so)


def test_engine_counts(rng):
    reads = random_reads(rng, n=10)
    eng = TpuBwt(so=SO_IO, K=16)
    eng.insert_multi(reads)
    cnt = eng.counts()
    assert cnt[0] == len(reads)
    assert cnt.sum() == sum(len(r) for r in reads) + len(reads)

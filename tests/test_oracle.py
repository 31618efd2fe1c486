"""Validate the Python oracle against brute-force suffix sorting and the
compiled reference binary (the reference's own de-facto methodology,
SURVEY.md §4)."""

import numpy as np
import pytest

from ropebwt2_tpu.alphabet import decode_nt6
from ropebwt2_tpu.bruteforce import bwt_bruteforce
from ropebwt2_tpu.oracle import SO_IO, SO_RCLO, SO_RLO, OracleIndex

from conftest import random_reads, reads_to_lines, run_ref


def _oracle_bwt_multi(reads, so, batches=1):
    idx = OracleIndex(so)
    splits = np.array_split(np.arange(len(reads)), batches)
    for part in splits:
        batch = [list(reversed(reads[i])) for i in part]
        if batch:
            idx.insert_multi(batch)
    return idx.bwt()


def _oracle_bwt_single(reads, so):
    idx = OracleIndex(so)
    for r in reads:
        idx.insert1(list(reversed(r)))
    return idx.bwt()


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
def test_oracle_multi_matches_bruteforce(so, rng):
    for trial in range(8):
        reads = random_reads(rng, n=int(rng.integers(1, 14)))
        got = _oracle_bwt_multi(reads, so)
        want = bwt_bruteforce(reads, so)
        assert got == want, (
            f"so={so} trial={trial} reads={[decode_nt6(r) for r in reads]}\n"
            f"got  {decode_nt6(got)}\nwant {decode_nt6(want)}"
        )


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
def test_oracle_single_matches_multi(so, rng):
    """-m0 single-string and batched construction are byte-identical
    (mode equivalence, SURVEY.md §4.2)."""
    for _ in range(6):
        reads = random_reads(rng, n=int(rng.integers(1, 10)))
        assert _oracle_bwt_single(reads, so) == _oracle_bwt_multi(reads, so)


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
def test_oracle_incremental_batches(so, rng):
    """Multiple insert_multi calls == one call (the -m batching / -i resume
    equivalence)."""
    for _ in range(6):
        reads = random_reads(rng, n=int(rng.integers(2, 12)))
        assert _oracle_bwt_multi(reads, so, batches=3) == _oracle_bwt_multi(
            reads, so
        )


def test_oracle_with_n_symbols(rng):
    for so in (SO_IO, SO_RLO, SO_RCLO):
        for _ in range(4):
            reads = random_reads(rng, n=8, with_n=True)
            assert _oracle_bwt_multi(reads, so) == bwt_bruteforce(reads, so)


@pytest.mark.parametrize(
    "so,flags", [(SO_IO, "-LR"), (SO_RLO, "-LRs"), (SO_RCLO, "-LRr")]
)
def test_oracle_matches_reference_binary(so, flags, ref_binary, rng):
    for _ in range(4):
        reads = random_reads(rng, n=12, lo=2, hi=15, with_n=True)
        ref_out = run_ref(ref_binary, [flags, "-P", "-"], reads_to_lines(reads))
        want = ref_out.decode().strip()
        got = decode_nt6(_oracle_bwt_multi(reads, so))
        assert got == want


def test_oracle_matches_reference_single_string(ref_binary, rng):
    reads = random_reads(rng, n=10)
    ref_out = run_ref(ref_binary, ["-LRm0", "-"], reads_to_lines(reads))
    got = decode_nt6(_oracle_bwt_single(reads, SO_IO))
    assert got == ref_out.decode().strip()

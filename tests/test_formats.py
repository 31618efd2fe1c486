"""FMR/FMD/CRLF format parity and interop with the reference binary."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from ropebwt2_tpu.engine import TpuBwt
from ropebwt2_tpu.io.crlf import read_crlf, write_crlf
from ropebwt2_tpu.io.fmd import write_fmd
from ropebwt2_tpu.io.fmr import (
    partition_runs_from_state,
    read_fmr_runs,
    read_fmr_state,
    write_fmr,
    write_fmr_runs,
)
from ropebwt2_tpu.io.rle_codec import dec_runs, enc_run

from conftest import random_reads, reads_to_lines, run_ref


def _build(reads, so=0):
    eng = TpuBwt(so=so, K=16)
    eng.insert_multi(reads)
    return eng


def test_rle_codec_roundtrip(rng):
    runs = [
        (int(rng.integers(0, 6)), int(l))
        for l in np.concatenate(
            [
                rng.integers(1, 16, 5),
                rng.integers(16, 256, 5),
                rng.integers(256, 1 << 19, 5),
                rng.integers(1 << 19, 1 << 43, 5),
            ]
        )
    ]
    payload = b"".join(enc_run(c, l) for c, l in runs)
    assert dec_runs(payload) == runs


def test_fmr_roundtrip(rng):
    eng = _build(random_reads(rng, n=25, with_n=True), so=1)
    buf = io.BytesIO()
    write_fmr(eng, buf, block_len=64, max_nodes=4)  # force a deep tree
    buf.seek(0)
    parts, so = read_fmr_runs(buf)
    assert so == 1
    assert parts == partition_runs_from_state(eng)


def test_fmr_readable_by_reference(ref_binary, rng, tmp_path):
    """Reference must be able to -i our FMR and continue building."""
    reads = random_reads(rng, n=30, lo=4, hi=15)
    a, b = reads[:15], reads[15:]
    eng = _build(a, so=1)
    fmr = tmp_path / "ours.fmr"
    with open(fmr, "wb") as f:
        write_fmr(eng, f)
    got = run_ref(ref_binary, ["-LR", "-i", str(fmr), "-"], reads_to_lines(b))
    want = run_ref(ref_binary, ["-LRs", "-"], reads_to_lines(reads))
    assert got == want


def test_fmr_restore_from_reference(ref_binary, rng, tmp_path):
    """We must be able to -i the reference's FMR and continue building."""
    reads = random_reads(rng, n=30, lo=4, hi=15)
    a, b = reads[:15], reads[15:]
    fmr = tmp_path / "ref.fmr"
    fmr.write_bytes(
        run_ref(ref_binary, ["-LRsb", "-"], reads_to_lines(a))
    )
    eng, so = read_fmr_state(str(fmr), K=16)
    assert so == 1
    eng.insert_multi(b)
    want = run_ref(ref_binary, ["-LRs", "-"], reads_to_lines(reads))
    from ropebwt2_tpu.io.text import bwt_to_text

    assert bwt_to_text(eng.bwt_array()) == want


@pytest.mark.parametrize("so,flags", [(0, "-LRd"), (1, "-LRsd")])
def test_fmd_byte_identical(so, flags, ref_binary, rng):
    reads = random_reads(rng, n=40, lo=5, hi=30, with_n=True)
    want = run_ref(ref_binary, [flags, "-"], reads_to_lines(reads))
    eng = _build(reads, so=so)
    buf = io.BytesIO()
    write_fmd(eng.runs(), buf, log_summary=False)
    assert buf.getvalue() == want


def test_crlf_byte_identical(ref_binary, rng):
    reads = random_reads(rng, n=40, lo=5, hi=30)
    want = run_ref(ref_binary, ["-LRB", "-"], reads_to_lines(reads))
    eng = _build(reads)
    buf = io.BytesIO()
    write_crlf(eng.runs(), eng.counts(), buf)
    assert buf.getvalue() == want


def test_fmd_roundtrip_and_reference_decode(ref_binary, rng):
    """Our FMD decoder reads back both our encoder's output and the
    reference's -d output (rld_restore equivalence)."""
    from ropebwt2_tpu.io.fmd import read_fmd

    reads = random_reads(rng, n=35, lo=5, hi=30, with_n=True)
    eng = _build(reads, so=1)
    buf = io.BytesIO()
    write_fmd(eng.runs(), buf, log_summary=False)
    buf.seek(0)
    runs, mcnt = read_fmd(buf)
    assert runs == eng.runs()
    assert mcnt[0] == eng.n

    ref_out = run_ref(ref_binary, ["-LRsd", "-"], reads_to_lines(reads))
    runs2, mcnt2 = read_fmd(io.BytesIO(ref_out))
    assert runs2 == eng.runs()
    assert mcnt2 == mcnt


def test_fmd_raw_rle_fallback():
    from ropebwt2_tpu.io.fmd import read_fmd

    # 5+3 raw rle: (len<<3|sym) bytes; zero-length bytes skipped.  Like the
    # reference, the first 4 bytes were consumed as a would-be magic before
    # the fallback loop runs (rld_restore_header, rld0.c:246-306), so the
    # payload starts at offset 4.
    raw = bytes([1, 2, 3, 4]) + bytes(
        [3 << 3 | 1, 2 << 3 | 1, 5 << 3 | 0, 0, 31 << 3 | 4]
    )
    runs, mcnt = read_fmd(io.BytesIO(raw))
    assert runs == [(1, 5), (0, 5), (4, 31)]
    assert mcnt[0] == 41 and mcnt[2] == 5 and mcnt[1] == 5


def test_crlf_roundtrip(rng):
    eng = _build(random_reads(rng, n=20))
    buf = io.BytesIO()
    write_crlf(eng.runs(), eng.counts(), buf)
    buf.seek(0)
    runs, tags, nsym = read_crlf(buf)
    assert nsym == 6
    assert runs == eng.runs()
    assert np.frombuffer(tags["MC"], dtype="<i8").tolist() == [
        int(c) for c in eng.counts()
    ]

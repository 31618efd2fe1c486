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


def test_fmd_reader_lazy_rank_and_dec_enc(ref_binary, rng, tmp_path):
    """FmdReader = rld_restore_mmap + rld_rank1a/2a + rld_dec_enc
    (rld0.c:308-327, 357-471; rld0.h:119-135): lazy mmap reader over a
    reference-written FMD, point ranks vs brute force, dec_enc re-encode
    byte-identical, and device rank over the restored index."""
    from ropebwt2_tpu.io.fmd import (
        FmdEncoder,
        FmdReader,
        RunTap,
        dec_enc,
        read_fmd,
    )

    reads = random_reads(rng, 200, lo=8, hi=60)
    fmd_path = tmp_path / "ref.fmd"
    subprocess.run(
        [ref_binary, "-LRd", "-o", str(fmd_path), "-"],
        input=reads_to_lines(reads), check=True, capture_output=True,
    )

    r = FmdReader(str(fmd_path))
    runs_eager, mcnt = read_fmd(str(fmd_path))
    assert list(r.runs()) == runs_eager
    assert r.mcnt == mcnt

    bwt = np.concatenate(
        [np.full(l, c, np.int8) for c, l in runs_eager]
    )
    n = len(bwt)
    for k in [0, 1, n // 3, n // 2, n - 1, n]:
        assert r.rank1a(k) == [(bwt[:k] == a).sum() for a in range(6)]
    for k, l in [(0, 4), (n // 3, n // 3 + 1), (n // 4, 3 * n // 4)]:
        ok, ol = r.rank2a(k, l)
        assert ok == [(bwt[:k] == a).sum() for a in range(6)]
        assert ol == [(bwt[:l] == a).sum() for a in range(6)]

    # extend: sizes of the six sub-intervals partition the parent
    out = r.extend((0, 0, n), is_back=True)
    assert sum(o[2] for o in out) == n

    # dec_enc: splicing the stream through an encoder in two arbitrary
    # slices reproduces the reference file byte-for-byte
    enc = FmdEncoder(6, 3)
    tap = RunTap(r.runs())
    dec_enc(enc, tap, n // 3)
    dec_enc(enc, tap, n - n // 3)
    enc.finish()
    buf = io.BytesIO()
    enc.dump(buf)
    assert buf.getvalue() == fmd_path.read_bytes()

    # restored FMD -> device FlatBwt -> batched rank parity
    from ropebwt2_tpu.engine.query import rank1a

    st = r.to_flat(K=16)
    pts = np.array([0, 1, n // 2, n], np.int64)
    occ = np.asarray(rank1a(st, pts))
    for i, k in enumerate(pts):
        assert list(occ[i]) == [(bwt[:k] == a).sum() for a in range(6)]


def test_fmd_native_bulk_decode(ref_binary, rng, tmp_path):
    """rb2_fmd_decode (the native bulk restore, rld_restore_mmap +
    rld_dec counterpart) must reproduce the Python block decoder's runs
    exactly on a reference-written FMD, and to_flat must restore a
    queryable index with the right counts."""
    from ropebwt2_tpu.io.fmd import FmdReader, read_fmd
    from ropebwt2_tpu.native.lib import fmd_decode, native_available

    reads = random_reads(rng, 300, lo=8, hi=80)
    fmd_path = tmp_path / "ref.fmd"
    subprocess.run(
        [ref_binary, "-LRd", "-o", str(fmd_path), "-"],
        input=reads_to_lines(reads), check=True, capture_output=True,
    )
    r = FmdReader(str(fmd_path))
    syms, lens = r.runs_arrays()
    runs_eager, mcnt = read_fmd(str(fmd_path))
    assert [(int(c), int(l)) for c, l in zip(syms, lens)] == runs_eager
    if native_available():
        dec = fmd_decode(str(fmd_path))
        assert dec is not None
        assert np.array_equal(dec[0], syms) and np.array_equal(dec[1], lens)
    st = r.to_flat()
    n = int(lens.sum())
    assert int(st.n) == n == mcnt[0]
    assert np.asarray(st.pcounts).sum() == n

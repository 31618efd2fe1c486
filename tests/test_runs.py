"""Unit tests for the run-length compressed device tier (index/runs.py):
rank parity vs brute force, batched insertion vs a plain-sequence oracle
(split/extend/dup-merge/host-replace cases), and the no-zero-length-run
flush invariant."""

import numpy as np
import pytest

import jax.numpy as jnp

from ropebwt2_tpu.index.runs import (
    KR,
    RCAP_ALIGN,
    RunBwt,
    apply_insertions_runs,
    empty_runs_state,
    rank_global_runs,
    runs_from_arrays,
    runs_to_host,
    searchsorted_le_value,
)

import dataclasses


def expand_runs(syms, lens):
    if len(syms) == 0:
        return np.zeros(0, np.int8)
    return np.repeat(np.asarray(syms, np.int8), np.asarray(lens))


def state_from_seq(seq, rcap=RCAP_ALIGN, bound=1 << 20):
    seq = np.asarray(seq, np.int8)
    if seq.size == 0:
        return empty_runs_state(rcap, bound)
    change = np.flatnonzero(np.diff(seq)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [seq.size]])
    syms = seq[starts]
    lens = (ends - starts).astype(np.int64)
    return runs_from_arrays(
        syms, lens, rcap, bound, seq.size, np.zeros(6), np.zeros((6, 6))
    )


def brute_rank(seq, g):
    out = np.zeros((len(g), 6), np.int64)
    for qi, q in enumerate(g):
        pre = seq[:q]
        for s in range(6):
            out[qi, s] = int((pre == s).sum())
    return out


def oracle_insert(seq, pos, sym, stream, valid):
    """Plain-sequence insertion oracle (same contract as index/merge.py)."""
    order = sorted(
        [i for i in range(len(pos)) if valid[i]], key=lambda i: stream[i]
    )
    out = list(seq)
    for k, i in enumerate(order):
        out.insert(int(pos[i]) + k, int(sym[i]))
    return np.asarray(out, np.int8)


def test_searchsorted_le_value():
    rng = np.random.default_rng(0)
    arr = np.sort(rng.integers(0, 1000, RCAP_ALIGN).astype(np.int32))
    arr[-100:] = np.iinfo(np.int32).max - (1 << 28)
    g = rng.integers(-5, 1100, 257).astype(np.int32)
    cnt, val = searchsorted_le_value(jnp.asarray(arr), jnp.asarray(g))
    ref = np.searchsorted(arr, g, side="right")
    assert (np.asarray(cnt) == ref).all()
    nz = ref > 0
    assert (np.asarray(val)[nz] == arr[ref[nz] - 1]).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rank_parity(seed):
    rng = np.random.default_rng(seed)
    # runny sequence: repeats make multi-symbol runs
    seq = np.repeat(
        rng.integers(0, 6, 500), rng.integers(1, 20, 500)
    ).astype(np.int8)
    st = state_from_seq(seq)
    g = np.concatenate(
        [[0, 1, len(seq) - 1, len(seq)],
         rng.integers(0, len(seq) + 1, 200)]
    ).astype(np.int64)
    occ = rank_global_runs(
        st.rend, st.rsym, st.bstart, st.bocc, jnp.asarray(g)
    )
    assert (np.asarray(occ) == brute_rank(seq, g)).all()


def test_rank_empty_state():
    st = empty_runs_state(RCAP_ALIGN, 1 << 20)
    occ = rank_global_runs(
        st.rend, st.rsym, st.bstart, st.bocc,
        jnp.asarray(np.zeros(4, np.int64)),
    )
    assert (np.asarray(occ) == 0).all()


def _apply(st, pos, sym, stream, valid):
    upd = apply_insertions_runs(
        st,
        jnp.asarray(pos),
        jnp.asarray(sym, jnp.int32),
        jnp.asarray(stream),
        jnp.asarray(valid),
    )
    return dataclasses.replace(st, n=st.n + int(valid.sum()), **upd)


def check_state(st, expected_seq):
    syms, lens = runs_to_host(st)
    got = expand_runs(syms, lens)
    assert got.shape == expected_seq.shape, (got.shape, expected_seq.shape)
    assert (got == expected_seq).all()
    assert int(st.overflow) == 0
    # flush invariant: no zero-length slots among live ones
    ns = int(st.nslot)
    if ns:
        rend = np.asarray(st.rend[:ns])
        idx = np.arange(ns)
        prev = np.where(idx % KR == 0, 0, np.concatenate([[0], rend[:-1]]))
        assert ((rend - prev) > 0).all()
    # rank parity on the updated tables
    g = np.linspace(0, expected_seq.size, 64).astype(np.int64)
    occ = rank_global_runs(
        st.rend, st.rsym, st.bstart, st.bocc, jnp.asarray(g)
    )
    assert (np.asarray(occ) == brute_rank(expected_seq, g)).all()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_insert_random_rounds(seed):
    rng = np.random.default_rng(seed)
    seq = np.repeat(
        rng.integers(0, 6, 60), rng.integers(1, 8, 60)
    ).astype(np.int8)
    st = state_from_seq(seq)
    M = 64
    for rnd in range(4):
        A = int(rng.integers(1, M))
        pos_v = np.sort(rng.integers(0, len(seq) + 1, A))
        sym_v = rng.integers(0, 6, A)
        # scatter valid rows across the batch, preserving order
        rows = np.sort(rng.choice(M, A, replace=False))
        pos = np.zeros(M, np.int64)
        sym = np.zeros(M, np.int64)
        stream = np.zeros(M, np.int64)
        valid = np.zeros(M, bool)
        pos[rows] = pos_v
        sym[rows] = sym_v
        stream[rows] = np.arange(A)
        valid[rows] = True
        st = _apply(st, pos, sym, stream, valid)
        seq = oracle_insert(seq, pos, sym, stream, valid)
        check_state(st, seq)


def test_insert_into_empty_and_dups():
    # empty state; duplicate positions and symbols (dup-merge + replace)
    st = empty_runs_state(RCAP_ALIGN, 1 << 20)
    pos = np.zeros(8, np.int64)
    sym = np.array([3, 3, 3, 1, 1, 4, 4, 4], np.int64)
    stream = np.arange(8, dtype=np.int64)
    valid = np.ones(8, bool)
    st = _apply(st, pos, sym, stream, valid)
    seq = oracle_insert(np.zeros(0, np.int8), pos, sym, stream, valid)
    check_state(st, seq)
    # second round: end-inserts + interior extends and splits
    n = len(seq)
    pos2 = np.array([0, 1, 1, 3, n, n], np.int64)
    sym2 = np.array([3, 3, 2, 1, 5, 5], np.int64)
    stream2 = np.arange(6, dtype=np.int64)
    valid2 = np.ones(6, bool)
    st = _apply(st, pos2, sym2, stream2, valid2)
    seq = oracle_insert(seq, pos2, sym2, stream2, valid2)
    check_state(st, seq)


def test_insert_heavy_extends():
    # runny base + same-symbol insertions: extends must not emit items
    rng = np.random.default_rng(5)
    seq = np.repeat([1, 2, 3, 4], 50).astype(np.int8)
    st = state_from_seq(seq)
    ns0 = int(st.nslot)
    A = 32
    pos = np.sort(rng.integers(1, 199, A)).astype(np.int64)
    sym = seq[np.minimum(pos, len(seq) - 1)].astype(np.int64)  # mostly ext
    stream = np.arange(A, dtype=np.int64)
    valid = np.ones(A, bool)
    st = _apply(st, pos, sym, stream, valid)
    seq2 = oracle_insert(seq, pos, sym, stream, valid)
    check_state(st, seq2)
    # pure extends create no new slots beyond boundary splits
    assert int(st.nslot) <= ns0 + 2 * A


def test_growth_and_multiblock():
    # force multiple 128-run blocks
    rng = np.random.default_rng(9)
    seq = rng.integers(0, 6, 700).astype(np.int8)  # ~alternating: many runs
    st = state_from_seq(seq, rcap=RCAP_ALIGN)
    for rnd in range(3):
        A = 100
        pos = np.sort(rng.integers(0, len(seq) + 1, A))
        sym = rng.integers(0, 6, A)
        stream = np.arange(A, dtype=np.int64)
        valid = np.ones(A, bool)
        st = _apply(st, pos.astype(np.int64), sym.astype(np.int64),
                    stream, valid)
        seq = oracle_insert(seq, pos, sym, stream, valid)
        check_state(st, seq)


def test_chunked_expand_parity(monkeypatch):
    """The chunked backward in-place expand must agree with the monolithic
    ladder (and the oracle) across multi-chunk layouts, item clustering at
    chunk boundaries, and the top/bottom chunks."""
    import ropebwt2_tpu.index.runs as R

    monkeypatch.setattr(R, "RUNS_BIG", 1)  # force the chunked path
    monkeypatch.setattr(R, "RUNS_CHUNK", RCAP_ALIGN)  # 16384-slot chunks
    rng = np.random.default_rng(17)
    rcap = 3 * RCAP_ALIGN
    for trial in range(4):
        nseq = [200, 2000, 16000, 40000][trial]
        seq = np.repeat(
            rng.integers(0, 6, nseq), rng.integers(1, 4, nseq)
        ).astype(np.int8)
        st = state_from_seq(seq, rcap=rcap)
        M = 512
        A = int(rng.integers(M // 2, M))
        if trial == 2:  # cluster all insertions at the end (top chunk)
            pos_v = np.sort(
                rng.integers(len(seq) - 50, len(seq) + 1, A)
            )
        else:
            pos_v = np.sort(rng.integers(0, len(seq) + 1, A))
        sym_v = rng.integers(0, 6, A)
        pos = np.zeros(M, np.int64)
        sym = np.zeros(M, np.int64)
        stream = np.zeros(M, np.int64)
        valid = np.zeros(M, bool)
        pos[:A] = pos_v
        sym[:A] = sym_v
        stream[:A] = np.arange(A)
        valid[:A] = True
        st = _apply(st, pos, sym, stream, valid)
        seq = oracle_insert(seq, pos, sym, stream, valid)
        check_state(st, seq)

"""Interpret-mode parity of the Pallas pending-merge kernel
(index/pending_pallas.py) against the XLA pending_add formulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from ropebwt2_tpu.index.pending import (
    KP,
    PendingIndex,
    _inf,
    _pending_add_pallas,
    pending_add,
)
from ropebwt2_tpu.index.rank import build_block_tables

I32 = np.int32


def make_pending(rng, pcap, pfill, nmax):
    vp = np.full(pcap, np.iinfo(I32).max - (1 << 28), I32)
    vp[:pfill] = np.sort(rng.integers(0, nmax, pfill).astype(I32))
    psym = np.full(pcap, 6, np.int8)
    psym[:pfill] = rng.integers(0, 6, pfill)
    jp = jnp.asarray(psym)
    return PendingIndex(
        vp=jnp.asarray(vp),
        psym=jp,
        blk_prefix=build_block_tables(jp, KP, dtype=jnp.int32),
        p=jnp.asarray(pfill, jnp.int32),
    )


@pytest.mark.parametrize("seed,pfill_frac", [(0, 0.3), (1, 0.0), (2, 0.9)])
def test_pending_merge_kernel_parity(seed, pfill_frac):
    rng = np.random.default_rng(seed)
    pcap = 1 << 17  # one kernel super-block
    pfill = int(pcap * pfill_frac)
    nmax = 1 << 24
    pend = make_pending(rng, pcap, pfill, nmax)

    M = 4096
    A = int(rng.integers(M // 2, M))
    gX = np.zeros(M, np.int32)
    gX[:A] = np.sort(rng.integers(0, nmax, A).astype(I32))
    sym = rng.integers(0, 6, M).astype(I32)
    stream = np.zeros(M, np.int32)
    stream[:A] = np.arange(A)
    active = np.arange(M) < A

    ref = pending_add(  # XLA path (pallas gate is off on CPU)
        pend, jnp.asarray(gX), jnp.asarray(sym), jnp.asarray(stream),
        jnp.asarray(active),
    )

    # kernel path, interpret mode: reproduce the scatter stage, then call
    # the kernel wrapper directly
    from ropebwt2_tpu.index.pending import searchsorted_blocked

    INF = _inf(jnp.int32)
    gq = jnp.where(jnp.asarray(active), jnp.asarray(gX), INF)
    k = searchsorted_blocked(pend.vp, gq)
    slot = jnp.where(jnp.asarray(active), jnp.asarray(stream) + k, pcap)
    sarr = jnp.zeros((pcap,), jnp.int8).at[slot].set(
        jnp.asarray((sym + 1).astype(np.int8)), mode="drop",
        unique_indices=True,
    )
    varr = jnp.zeros((pcap,), jnp.int32).at[slot].set(
        jnp.asarray(gX + stream, dtype=jnp.int32), mode="drop",
        unique_indices=True,
    )
    got = _pending_add_pallas(pend, varr, sarr, jnp.asarray(active),
                              interpret=True)

    assert np.array_equal(np.asarray(got.vp), np.asarray(ref.vp))
    assert np.array_equal(np.asarray(got.psym), np.asarray(ref.psym))
    assert int(got.p) == int(ref.p)
    live_rows = (pfill + A) // KP + 1
    assert np.array_equal(
        np.asarray(got.blk_prefix)[:live_rows],
        np.asarray(ref.blk_prefix)[:live_rows],
    )

"""Plan-phase Pallas kernels (engine/plan_pallas.py), interpret mode on CPU:
unit parity of sort_dest, full plan parity vs the XLA plan_round, and an
end-to-end engine build against the reference binary."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ropebwt2_tpu.engine.bcr import I32, ReadStates, plan_round
from ropebwt2_tpu.engine.plan_pallas import plan_round_tpu, sort_dest
from ropebwt2_tpu.index.flat import PAD_TAIL
from ropebwt2_tpu.index.rank import build_block_tables, rank_global
from ropebwt2_tpu.oracle import SO_IO, SO_RCLO, SO_RLO


def test_sort_dest_matches_stable_counting_sort():
    rng = np.random.default_rng(0)
    m = 2048
    pk = (rng.integers(0, 1 << 20, m) << 3 | rng.integers(0, 6, m)).astype(
        np.int32
    )
    pk[rng.random(m) < 0.1] = -1  # dead rows
    dest = np.asarray(sort_dest(jnp.asarray(pk), interpret=True))
    key = np.where(pk < 0, 0, pk & 7)
    order = np.argsort(key, kind="stable")
    expect = np.empty(m, np.int64)
    expect[order] = np.arange(m)
    np.testing.assert_array_equal(dest, expect)


def _synth_state(m, cap, k, so, seed):
    """A mid-round read state with realistic invariants: reads sorted by
    (bucket, u), group members sharing intervals, some dead/done rows."""
    rng = np.random.default_rng(seed)
    n0 = cap // 2
    bwt = np.full(cap + PAD_TAIL, 6, np.int8)
    bwt[:n0] = rng.integers(0, 6, n0)
    jb = jnp.asarray(bwt)
    blkp = build_block_tables(jb, k, dtype=jnp.int32)
    psize = np.full(6, n0 // 6, np.int64)
    psize[5] = n0 - psize[:5].sum()
    pc = np.zeros((6, 6), np.int64)
    for b in range(6):
        pc[b, :] = psize[b] // 6
        pc[b, 5] = psize[b] - pc[b, :5].sum()

    stride = 40
    buf = np.zeros(m * stride, np.int8)
    buf.reshape(m, stride)[:, :32] = rng.integers(1, 5, (m, 32))
    # bucket-sorted state with groups: draw group intervals then repeat
    c = np.sort(rng.integers(1, 6, m)).astype(np.int32)
    lo = np.sort(rng.integers(0, n0 // 8, m)).astype(np.int32)
    u = (lo + rng.integers(0, 3, m)).astype(np.int32)
    l = np.maximum(lo - rng.integers(0, 2, m), 0).astype(np.int32)
    pk = ((np.arange(m, dtype=np.int32) * stride) >> 3 << 3) | c
    dead = rng.random(m) < 0.05
    done = rng.random(m) < 0.05
    pk = np.where(dead, -1, pk)
    pk = np.where(~dead & done, pk & ~7, pk)  # c == 0: retired
    reads = ReadStates(
        l=jnp.asarray(l), u=jnp.asarray(u), pk=jnp.asarray(pk)
    )
    rank_fn = lambda g: rank_global(  # noqa: E731
        jb, blkp, jnp.clip(g, 0, n0), k
    )
    return psize, pc, reads, jnp.asarray(buf), rank_fn


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
@pytest.mark.parametrize("is_first", [False, True])
def test_plan_round_tpu_matches_plan_round(so, is_first):
    m, cap, k = 1024, 1 << 16, 256
    psize, pc, reads, buf, rank_fn = _synth_state(m, cap, k, so, seed=so + 7)
    d = jnp.asarray(3, I32)
    a = plan_round(
        jnp.asarray(psize), jnp.asarray(pc), reads, buf, d,
        jnp.asarray(is_first), rank_fn, so=so,
    )
    b = plan_round_tpu(
        jnp.asarray(psize), jnp.asarray(pc), reads, buf, d,
        jnp.asarray(is_first), rank_fn, so=so, interpret=True,
    )
    (ra, gXa, syma, sta, acta, iba, nia) = a
    (rb, gXb, symb, stb, actb, ibb, nib) = b
    act = np.asarray(acta)
    np.testing.assert_array_equal(act, np.asarray(actb))
    np.testing.assert_array_equal(np.asarray(iba), np.asarray(ibb))
    assert int(nia) == int(nib)
    for xa, xb in ((ra.l, rb.l), (ra.u, rb.u), (ra.pk, rb.pk)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    # per-insertion outputs only matter on active rows
    for xa, xb in ((gXa, gXb), (syma, symb), (sta, stb)):
        np.testing.assert_array_equal(
            np.asarray(xa)[act], np.asarray(xb)[act]
        )


def test_engine_interp_plan_vs_reference(ref_binary):
    """End-to-end: a build big enough (mpad >= 1024) to take the kernel
    path, forced into interpret mode in a fresh process, vs the oracle."""
    code = r"""
import sys, numpy as np, jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
from ropebwt2_tpu.engine import TpuBwt
from ropebwt2_tpu.alphabet import decode_nt6, encode_nt6
rng = np.random.default_rng(5)
reads = [rng.integers(1, 5, rng.integers(3, 40)).astype(np.int8)
         for _ in range(1100)]
strs = ["".join("ACGTN"[i - 1] for i in r) for r in reads]
for so in (0, 1, 2):
    eng = TpuBwt(so=so)
    eng.insert_multi([encode_nt6(s.encode()) for s in strs])
    sys.stdout.write(decode_nt6(eng.bwt_array()) + "\n")
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    env = dict(os.environ)
    env.update(
        ROPEBWT2_TPU_PLAN="interp",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=900, check=True,
    ).stdout.splitlines()
    rng = np.random.default_rng(5)
    reads = [
        rng.integers(1, 5, rng.integers(3, 40)).astype(np.int8)
        for _ in range(1100)
    ]
    strs = ["".join("ACGTN"[i - 1] for i in r) for r in reads]
    lines = ("\n".join(strs) + "\n").encode()
    for i, flags in enumerate(["-LR", "-LRs", "-LRr"]):
        ref = subprocess.run(
            [ref_binary, flags, "-"], input=lines, capture_output=True,
            check=True,
        ).stdout.decode().strip()
        assert out[i] == ref, f"{flags}: interp-plan engine != reference"

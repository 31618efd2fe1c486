"""shard_map multi-device BCR must match the single-device engine exactly
(on the virtual 8-device CPU mesh)."""

import numpy as np
import pytest

from ropebwt2_tpu.engine import TpuBwt
from ropebwt2_tpu.oracle import SO_IO, SO_RCLO, SO_RLO

from conftest import random_reads


def _make(so):
    import jax
    from ropebwt2_tpu.parallel.sharded import ShardedTpuBwt

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return ShardedTpuBwt(so=so, K=256)


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
def test_sharded_matches_single_device(so, rng):
    reads = random_reads(rng, n=40, lo=4, hi=25, with_n=True)
    single = TpuBwt(so=so, K=256)
    single.insert_multi(reads)
    sharded = _make(so)
    sharded.insert_multi(reads)
    assert np.array_equal(sharded.bwt_array(), single.bwt_array())
    assert np.array_equal(sharded.counts(), single.counts())


def test_sharded_cli(ref_binary, rng):
    """CLI with ROPEBWT2_TPU_SHARDED=1 on the virtual mesh matches the
    reference byte-for-byte."""
    import os
    import subprocess
    import sys

    from conftest import reads_to_lines, run_ref

    reads = random_reads(rng, n=25, lo=4, hi=15)
    data = reads_to_lines(reads)
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        ROPEBWT2_TPU_SHARDED="1",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "ropebwt2_tpu.cli", "-LRs", "-"],
        input=data, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        cwd=repo, env=env,
    )
    assert r.returncode == 0, r.stderr.decode()
    assert b"sharded engine over 8 devices" in r.stderr
    assert r.stdout == run_ref(ref_binary, ["-LRs", "-"], data)


def test_sharded_incremental_batches(rng):
    reads = random_reads(rng, n=60, lo=4, hi=20)
    single = TpuBwt(so=SO_RLO, K=256)
    single.insert_multi(reads)
    sharded = _make(SO_RLO)
    sharded.insert_multi(reads[:25])
    sharded.insert_multi(reads[25:])
    assert np.array_equal(sharded.bwt_array(), single.bwt_array())

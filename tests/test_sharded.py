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


def test_sharded_incremental_batches(rng):
    reads = random_reads(rng, n=60, lo=4, hi=20)
    single = TpuBwt(so=SO_RLO, K=256)
    single.insert_multi(reads)
    sharded = _make(SO_RLO)
    sharded.insert_multi(reads[:25])
    sharded.insert_multi(reads[25:])
    assert np.array_equal(sharded.bwt_array(), single.bwt_array())

"""Mixed position dtypes (partition-local int32 intervals + int64 global
touchpoints — the >= 2^31 capacity regime) must be byte-identical to the
uniform-dtype engine.  Forced on small inputs by patching _gdt_of."""

import numpy as np
import pytest

from ropebwt2_tpu.engine import TpuBwt
from ropebwt2_tpu.oracle import SO_IO, SO_RCLO, SO_RLO

from conftest import random_reads


@pytest.fixture
def force_gdt64(monkeypatch):
    from ropebwt2_tpu.engine import bcr

    monkeypatch.setattr(bcr, "_gdt_of", lambda state, pdt: bcr.I64)


@pytest.mark.parametrize("so", [SO_IO, SO_RLO, SO_RCLO])
def test_mixed_gdt_parity(so, rng, force_gdt64):
    reads = random_reads(rng, n=70, lo=4, hi=30, with_n=True)
    want = TpuBwt(so=so)
    # reference build in a fresh interpreter state: same engine without
    # the patch is exercised by the rest of the suite; here compare the
    # patched engine against the pure-Python oracle
    from ropebwt2_tpu.oracle import OracleIndex as Mrope

    orc = Mrope(so=so)
    orc.insert_multi([list(reversed(list(r))) for r in reads])
    eng = TpuBwt(so=so)
    eng.insert_multi(reads[:30])
    eng.insert_multi(reads[30:])
    assert np.array_equal(eng.bwt_array(), np.asarray(orc.bwt(), np.int8))


def test_mixed_gdt_deferred_and_packed(rng, force_gdt64, monkeypatch):
    from ropebwt2_tpu.oracle import OracleIndex as Mrope

    reads = random_reads(rng, n=60, lo=5, hi=25)
    orc = Mrope(so=SO_RLO)
    orc.insert_multi([list(reversed(list(r))) for r in reads])
    want = np.asarray(orc.bwt(), np.int8)

    eng = TpuBwt(so=SO_RLO, defer_r=4)
    eng.insert_multi(reads)
    assert np.array_equal(eng.bwt_array(), want)

    monkeypatch.setenv("ROPEBWT2_TPU_PACK4", "1")
    engp = TpuBwt(so=SO_RLO, defer_r=4)
    engp.insert_multi(reads)
    assert np.array_equal(engp.bwt_array(), want)

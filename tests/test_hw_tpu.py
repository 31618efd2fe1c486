"""On-hardware Pallas regression test (VERDICT round-1 item 6).

Gated behind ROPEBWT2_TPU_HWTEST=1 because it needs the real TPU and
remote Mosaic compiles take minutes; CI runs interpret mode only.  Runs
scripts/hwtest_tpu.py in a fresh process WITHOUT the CPU-forcing env so
the axon TPU backend is used, and checks kernel + engine byte parity.

Documented in HACKING.md; run it in the bench environment as:

    ROPEBWT2_TPU_HWTEST=1 python -m pytest tests/test_hw_tpu.py -s
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("ROPEBWT2_TPU_HWTEST") != "1",
    reason="on-hardware test; set ROPEBWT2_TPU_HWTEST=1 on a TPU machine",
)
def test_pallas_and_engine_on_tpu():
    env = dict(os.environ)
    # undo the conftest CPU forcing so the axon TPU backend registers:
    # restore the saved launch values (or unset)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS"):
        orig = env.pop("ROPEBWT2_TPU_ORIG_" + k, None)
        if orig is not None:
            env[k] = orig
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "hwtest_tpu.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=1800,
    )
    out = r.stdout.decode()
    assert r.returncode == 0, out[-4000:]
    assert "HWTEST OK" in out, out[-4000:]

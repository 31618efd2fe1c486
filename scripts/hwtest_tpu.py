"""On-hardware regression check: the Pallas merge kernel and a full TpuBwt
batch must be byte-identical on the real TPU to the CPU/XLA reference path.

Run with the TPU backend active (do NOT force JAX_PLATFORMS=cpu).  Exits 0
and prints HWTEST OK on success.  Invoked by tests/test_hw_tpu.py when
ROPEBWT2_TPU_HWTEST=1 (kept out of default CI: remote compiles are slow)
and by the bench environment.
"""
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"expected a TPU backend, got {dev.platform}"
    print(f"HWTEST device {dev.platform}:{dev.device_kind}", flush=True)

    from ropebwt2_tpu.index.flat import PAD_TAIL
    from ropebwt2_tpu.index.merge import apply_insertions
    from ropebwt2_tpu.index.merge_pallas import merge_pallas

    rng = np.random.default_rng(7)

    # --- kernel parity: sparse + dense insertion patterns ---
    CAP, K = 131072, 256
    n = 100000
    bwt = np.full(CAP + PAD_TAIL, 6, np.int8)
    bwt[:n] = rng.integers(0, 6, n)
    jb = jnp.asarray(bwt)
    for label, M, mkpos in (
        ("sparse", 512, lambda: rng.integers(0, n + 1, 512)),
        ("dense", 8192, lambda: np.concatenate(
            [np.zeros(5000, np.int64), rng.integers(0, 4000, 3192)])),
    ):
        pos = np.sort(mkpos()).astype(np.int32)
        M = len(pos)
        sym = rng.integers(0, 6, M).astype(np.int32)
        stream = np.arange(M, dtype=np.int32)
        valid = np.ones(M, bool)
        jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]
        t0 = time.time()
        got, _ = merge_pallas(jb, *jargs, n=jnp.asarray(n, jnp.int32), K=K)
        got = np.asarray(got)
        ref = np.asarray(apply_insertions(jb, jnp.asarray(n), *jargs))
        lim = n + M
        assert np.array_equal(ref[:lim], got[:lim]), f"kernel parity: {label}"
        print(f"HWTEST kernel {label} OK ({time.time()-t0:.1f}s)", flush=True)

    # --- numerics audit: the guarded primitives at 2^19..2^21 rows (the
    # regime where XLA:TPU's default matmul precision silently corrupted
    # integer contractions; see index/scan.py) ---
    import os
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/probe_numerics_tpu.py"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=1500,
    )
    out = r.stdout.decode()
    assert r.returncode == 0, out[-2000:]
    print("HWTEST numerics audit OK", flush=True)

    # --- kernel parity at the formerly-corrupt regime: clumped insertions,
    # cap 2^23, M 2^18 (hardware-only corruption before the precision fix) ---
    CAPb, Mb = 1 << 23, 1 << 18
    n_b = CAPb // 2
    bwtb = np.full(CAPb + PAD_TAIL, 6, np.int8)
    bwtb[:n_b] = rng.integers(0, 6, n_b)
    poff = (np.arange(6) * (n_b // 6)).astype(np.int64)
    lo = np.sort(rng.integers(0, n_b // 8, Mb)).astype(np.int64)
    bucket = np.sort(rng.integers(0, 6, Mb))
    posb = np.sort((poff[bucket] + lo).astype(np.int32))
    symb = rng.integers(0, 6, Mb).astype(np.int32)
    jbb = jnp.asarray(bwtb)
    jargs = [jnp.asarray(x) for x in (posb, symb,
                                      np.arange(Mb, dtype=np.int32),
                                      np.ones(Mb, bool))]
    t0 = time.time()
    got, _ = merge_pallas(jbb, *jargs, n=jnp.asarray(n_b, jnp.int64), K=128)
    ref = np.asarray(apply_insertions(jbb, jnp.asarray(n_b), *jargs))
    lim = n_b + Mb
    assert np.array_equal(ref[:lim], np.asarray(got)[:lim]), "clumped big-cap"
    print(f"HWTEST kernel clumped big-cap OK ({time.time()-t0:.1f}s)",
          flush=True)

    # --- full engine batch on the chip vs the CPU path in a subprocess ---
    from ropebwt2_tpu.engine import TpuBwt

    M, L, so = 4096, 33, 1
    rng2 = np.random.default_rng(12345)
    reads = rng2.integers(1, 5, size=(M, L)).astype(np.int8)
    eng = TpuBwt(so=so)
    eng.insert_multi(reads)
    tpu_bwt = eng.bwt_array()
    print("HWTEST engine batch done", flush=True)

    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    cpu = subprocess.run(
        [sys.executable, "-c",
         "import sys, numpy as np\n"
         "sys.path.insert(0, '/root/repo')\n"
         "import jax; jax.config.update('jax_platforms', 'cpu')\n"
         "from ropebwt2_tpu.engine import TpuBwt\n"
         "rng = np.random.default_rng(12345)\n"
         f"reads = rng.integers(1, 5, size=({M}, {L})).astype(np.int8)\n"
         f"eng = TpuBwt(so={so})\n"
         "eng.insert_multi(reads)\n"
         "sys.stdout.buffer.write(eng.bwt_array().tobytes())\n"],
        env=env, stdout=subprocess.PIPE, check=True,
    )
    cpu_bwt = np.frombuffer(cpu.stdout, dtype=np.int8)
    assert np.array_equal(tpu_bwt, cpu_bwt), "engine TPU != CPU"
    print(f"HWTEST engine parity OK ({len(cpu_bwt)} symbols)", flush=True)

    # --- PACKED engine batch on the chip (packed Pallas kernel + tables)
    # vs the same CPU reference: catches hardware-vs-interpret semantic
    # divergences (e.g. Mosaic's bf16 MXU dot rounding, round 4) ---
    os.environ["ROPEBWT2_TPU_PACK4"] = "1"
    os.environ["ROPEBWT2_TPU_DEFER_R"] = "8"
    try:
        engp = TpuBwt(so=so)
        engp._plan(3 * M * (L + 1))
        engp.insert_multi(reads)
        packed_bwt = engp.bwt_array()
    finally:
        os.environ.pop("ROPEBWT2_TPU_PACK4", None)
        os.environ.pop("ROPEBWT2_TPU_DEFER_R", None)
    assert np.array_equal(packed_bwt, cpu_bwt), "packed engine TPU != CPU"
    print("HWTEST packed engine parity OK", flush=True)
    print("HWTEST OK", flush=True)


if __name__ == "__main__":
    main()

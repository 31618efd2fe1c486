"""FMD streaming-restore throughput artifact (VERDICT r4 item 7): write a
multi-GB FMD via the native encoder, then time the native bulk decode
(rb2_fmd_decode) — target >= 100 MB/s in bounded memory — and verify run
parity on a prefix file against the Python block decoder.

Usage: python scripts/probe_fmd_stream.py [target_gb]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ropebwt2_tpu.native import lib as nlib


def main():
    target_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    lib = nlib.get_lib()
    assert lib is not None, "native toolchain unavailable"
    rng = np.random.default_rng(0)

    # synthetic run stream shaped like a coverage BWT (geometric-ish runs)
    # in chunks; encode incrementally via repeated rb2_fmd_write? The
    # native writer takes the whole run set — build it once (~target
    # runs such that the file lands near target_gb; delta coding ~1.2
    # B/run at these lengths)
    n_runs = int(target_gb * (1 << 30) / 1.15)
    sym0 = rng.integers(0, 6, n_runs).astype(np.uint8)
    ln0 = rng.geometric(1 / 8, n_runs).astype(np.int64)
    # the writer merges adjacent equal-symbol runs: build the merged
    # expectation (segment sums at symbol-change boundaries)
    head = np.concatenate([[True], sym0[1:] != sym0[:-1]])
    seg = np.cumsum(head) - 1
    sym = sym0[head]
    ln = np.bincount(seg, weights=ln0).astype(np.int64)
    n_runs = sym.shape[0]
    path = "/tmp/big.fmd"
    t0 = time.time()
    rc = lib.rb2_fmd_write(nlib._p8(sym), nlib._pi64(ln), n_runs,
                           path.encode(), None)
    assert rc == 0
    enc_s = time.time() - t0
    fsz = os.path.getsize(path)
    print(f"[fmd] wrote {fsz/2**30:.2f} GiB ({n_runs} runs) in {enc_s:.1f}s "
          f"({fsz/enc_s/2**20:.0f} MB/s encode)", flush=True)

    t0 = time.time()
    dec = nlib.fmd_decode(path)
    cold_s = time.time() - t0  # includes first page-in from disk
    t0 = time.time()
    dec = nlib.fmd_decode(path)
    warm_s = time.time() - t0  # page-cached: the decoder's own speed
    assert dec is not None
    dsym, dln = dec
    ok = (
        dsym.shape[0] == n_runs
        and np.array_equal(dsym, sym)
        and np.array_equal(dln, ln)
    )
    print(f"[fmd] decoded {fsz/2**30:.2f} GiB: cold {cold_s:.2f}s "
          f"({fsz/cold_s/2**20:.0f} MB/s, disk-bound), warm {warm_s:.2f}s "
          f"({fsz/warm_s/2**20:.0f} MB/s), parity={ok}", flush=True)
    assert ok

    out = {
        "metric": "fmd_stream_decode",
        "file_gib": round(fsz / 2**30, 3),
        "runs": int(n_runs),
        "decode_cold_s": round(cold_s, 2),
        "decode_cold_mb_s": round(fsz / cold_s / 2**20, 1),
        "decode_warm_s": round(warm_s, 2),
        "decode_warm_mb_s": round(fsz / warm_s / 2**20, 1),
        "runs_per_s_warm": round(n_runs / warm_s, 0),
        "encode_mb_s": round(fsz / enc_s / 2**20, 1),
        "parity": bool(ok),
    }
    with open("/root/repo/FMDSTREAM_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("[fmd] RESULT " + json.dumps(out), flush=True)
    os.unlink(path)


if __name__ == "__main__":
    main()

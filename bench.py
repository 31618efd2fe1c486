#!/usr/bin/env python
"""Benchmark: BCR construction throughput on the attached TPU chip.

Headline metric: symbols inserted per second per chip, RLO mode, on a
simulated short-read batch — directly comparable to the reference's worm
RLO row (66.8M x 100bp in 506 s wall on a 48-core Xeon = 13.2 Msym/s,
BASELINE.md).  Prints exactly one JSON line on stdout.

The device work runs in a watchdog subprocess: a wedged remote-attached TPU
(or a hung compile service) produces a well-formed failure JSON instead of
no output.

Env knobs: BENCH_M (#reads), BENCH_L (read length), BENCH_SO (0/1/2),
BENCH_TIMEOUT (seconds, default 1500), BENCH_CPU=1 (force local CPU).
"""

import json
import os
import subprocess
import sys
import time

BASELINE = 13.2e6  # ropebwt2 worm-RLO wall symbols/s (BASELINE.md)


def inner():
    import numpy as np

    M = int(os.environ.get("BENCH_M", 1 << 17))
    L = int(os.environ.get("BENCH_L", 101))
    so = int(os.environ.get("BENCH_SO", 1))

    import jax

    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from ropebwt2_tpu.engine import TpuBwt

    rng = np.random.default_rng(0)
    reads = rng.integers(1, 5, size=(M, L)).astype(np.int8)
    syms = M * (L + 1)

    def run():
        eng = TpuBwt(so=so)
        t0 = time.time()
        eng.insert_multi(reads)
        # a real device->host transfer is the only trustworthy sync point on
        # remote-attached backends (block_until_ready can return early)
        cnt = eng.counts()
        dt = time.time() - t0
        assert int(cnt[0]) == M and int(cnt.sum()) == syms, "self-check failed"
        return dt, eng

    t_warm, eng = run()  # compile (persistent-cached) + run
    print(f"[bench] warmup/compile: {t_warm:.1f}s", file=sys.stderr)
    del eng  # free device buffers before timed runs
    t_best = eng = None
    for _ in range(3):
        if eng is not None:
            del eng
        t, eng = run()
        t_best = t if t_best is None else min(t_best, t)
    value = syms / t_best
    dev = jax.devices()[0]
    print(
        f"[bench] {M} x {L}bp (so={so}): {t_best:.3f}s on "
        f"{dev.platform}:{dev.device_kind}",
        file=sys.stderr,
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "metric": "bcr_insert_throughput_rlo",
                "value": round(value, 1),
                "unit": "symbols/s/chip",
                "vs_baseline": round(value / BASELINE, 3),
                "detail": {
                    "reads": M,
                    "read_len": L,
                    "sorting_order": so,
                    "wall_s": round(t_best, 4),
                    "device": f"{dev.platform}:{dev.device_kind}",
                    "baseline": "ropebwt2 -brRm10g worm 13.2 Msym/s wall (README.md:176)",
                },
            }
        )
    )


def main():
    timeout = float(os.environ.get("BENCH_TIMEOUT", 1500))
    env = dict(os.environ)
    env["ROPEBWT2_TPU_BENCH_INNER"] = "1"
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, timeout=timeout,
        )
        for line in r.stdout.decode().splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):])
                return
        err = f"no result (exit {r.returncode})"
    except subprocess.TimeoutExpired:
        err = f"device timeout after {timeout:.0f}s"
    print(
        json.dumps(
            {
                "metric": "bcr_insert_throughput_rlo",
                "value": 0.0,
                "unit": "symbols/s/chip",
                "vs_baseline": 0.0,
                "error": err,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("ROPEBWT2_TPU_BENCH_INNER") == "1":
        inner()
    else:
        main()

#!/usr/bin/env python
"""Benchmark: BCR construction throughput on the attached TPU chip.

Headline metric: symbols inserted per second per chip, RLO mode, on a
simulated short-read batch — directly comparable to the reference's worm
RLO row (66.8M x 100bp in 506 s wall on a 48-core Xeon = 13.2 Msym/s,
BASELINE.md).  Prints exactly one JSON line on stdout.

Built to be un-timeout-able: the device work runs in a watchdog subprocess
that STREAMS a RESULT line after the warmup run (compile included — a
degraded but honest number) and after every timed run.  The parent keeps
the freshest line, kills the child shortly before the budget expires, and
reports the best number seen.  If the chip produces nothing at all (wedged
device, failed compile), a small CPU run provides a clearly-labeled
last-resort number — value 0.0 only happens if even CPU can't run.

Env knobs: BENCH_M (#reads), BENCH_L (read length), BENCH_SO (0/1/2),
BENCH_RUNS (timed runs, default 5 — the tunneled chip shows sporadic
~0.3-0.5 s per-run overhead windows; the best-of over more runs is the
honest estimator of device cost), BENCH_TIMEOUT (seconds, default 1500),
BENCH_CPU=1 (force local CPU).
"""

import json
import os
import subprocess
import sys
import threading
import time

BASELINE = 13.2e6  # ropebwt2 worm-RLO wall symbols/s (BASELINE.md)
METRIC = "bcr_insert_throughput_rlo"


def inner():
    import numpy as np

    M = int(os.environ.get("BENCH_M", 1 << 17))
    L = int(os.environ.get("BENCH_L", 101))
    so = int(os.environ.get("BENCH_SO", 1))
    runs = int(os.environ.get("BENCH_RUNS", 5))
    K = int(os.environ.get("BENCH_K", 128))  # 128 measures ~4% faster than 256

    import jax

    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from ropebwt2_tpu.engine import TpuBwt

    rng = np.random.default_rng(0)
    reads = rng.integers(1, 5, size=(M, L)).astype(np.int8)
    syms = M * (L + 1)
    dev = jax.devices()[0]
    devs = f"{dev.platform}:{dev.device_kind}"

    def run():
        eng = TpuBwt(so=so, K=K)
        t0 = time.time()
        eng.insert_multi(reads)
        # a real device->host transfer is the only trustworthy sync point on
        # remote-attached backends (block_until_ready can return early)
        cnt = eng.counts()
        dt = time.time() - t0
        assert int(cnt[0]) == M and int(cnt.sum()) == syms, "self-check failed"
        return dt

    def report(t, degraded, nrun):
        value = syms / t
        obj = {
            "metric": METRIC,
            "value": round(value, 1),
            "unit": "symbols/s/chip",
            "vs_baseline": round(value / BASELINE, 3),
            "detail": {
                "reads": M,
                "read_len": L,
                "sorting_order": so,
                "wall_s": round(t, 4),
                "device": devs,
                "timed_runs": nrun,
                "baseline":
                    "ropebwt2 -brRm10g worm 13.2 Msym/s wall (README.md:176)",
            },
        }
        if degraded:
            obj["degraded"] = degraded
        print("RESULT " + json.dumps(obj), flush=True)

    t_warm = run()  # compile (persistent-cached) + run
    print(f"[bench] warmup(+compile): {t_warm:.1f}s on {devs}",
          file=sys.stderr)
    report(t_warm, "warmup-includes-compile", 0)
    best = None
    for i in range(runs):
        t = run()
        best = t if best is None else min(best, t)
        print(f"[bench] run {i + 1}/{runs}: {t:.3f}s (best {best:.3f}s)",
              file=sys.stderr)
        report(best, None if i == runs - 1 else "partial", i + 1)


def run_child(extra_env, deadline):
    """Run the inner benchmark, harvesting RESULT lines as they stream;
    returns (last_result_json_str_or_None, exit_status)."""
    env = dict(os.environ)
    env["ROPEBWT2_TPU_BENCH_INNER"] = "1"
    env.update(extra_env)
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
    )
    last = [None]

    def reader():
        for line in p.stdout:
            if line.startswith("RESULT "):
                last[0] = line[len("RESULT "):].strip()

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    while True:
        rc = p.poll()
        if rc is not None:
            th.join(5)
            return last[0], rc
        if time.time() > deadline:
            p.kill()
            th.join(5)
            return last[0], "timeout"
        time.sleep(1)


def main():
    timeout = float(os.environ.get("BENCH_TIMEOUT", 1500))
    t0 = time.time()
    result, rc = run_child({}, t0 + timeout - 45)
    if rc not in (0,):
        print(f"[bench] device child ended with {rc}", file=sys.stderr)
    if (
        result is None
        and os.environ.get("BENCH_CPU") != "1"
        and time.time() < t0 + timeout - 150
    ):
        # nothing at all from the device (wedged chip / failed compile):
        # last-resort CPU number, clearly labeled
        print("[bench] no device result; CPU fallback", file=sys.stderr)
        result, _ = run_child(
            {
                "BENCH_CPU": "1",
                "PALLAS_AXON_POOL_IPS": "",
                "JAX_PLATFORMS": "cpu",
                "BENCH_M": str(1 << 14),
                "BENCH_RUNS": "1",
            },
            t0 + timeout - 20,
        )
        if result is not None:
            obj = json.loads(result)
            obj["degraded"] = "cpu-fallback"
            result = json.dumps(obj)
    if result is not None:
        print(result)
        return
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": 0.0,
                "unit": "symbols/s/chip",
                "vs_baseline": 0.0,
                "error": f"no result within {timeout:.0f}s (last status: {rc})",
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("ROPEBWT2_TPU_BENCH_INNER") == "1":
        inner()
    else:
        main()

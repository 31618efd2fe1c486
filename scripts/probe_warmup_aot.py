"""Warmup mitigation probe (VERDICT r4 item 6): can a compiled program be
serialized by one process and loaded by a fresh process WITHOUT paying the
remote compile again, on this toolchain?

Stages (results recorded in WARMUP_r05.json):
1. jax.jit(...).lower().compile() + jax.experimental.serialize_executable
   round-trip IN-PROCESS (sanity).
2. cross-PROCESS: parent serializes, child deserializes + runs, timing the
   child's end-to-end latency vs a cold-compile child.
Both for (a) a pure-XLA program and (b) a pallas_call-containing program —
the persistent compilation cache already AOT-loads (a) but fails (b) with
a machine-feature mismatch (HACKING.md round-4 item 9); this probe checks
whether explicit executable serialization shares that fate.
"""
import json
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CHILD = os.environ.get("WARMUP_CHILD")


def build_fns():
    import jax
    import jax.numpy as jnp

    def xla_fn(x):
        return (x * 2 + jnp.cumsum(x, axis=0)).sum()

    def pallas_fn(x):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(i_ref, o_ref):
            o_ref[...] = i_ref[...] * 2 + 1

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x).sum()

    return {"xla": xla_fn, "pallas": pallas_fn}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import serialize_executable as se

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = {}
    for name, fn in build_fns().items():
        rec = {}
        t0 = time.time()
        lowered = jax.jit(fn).lower(x)
        compiled = lowered.compile()
        rec["compile_s"] = round(time.time() - t0, 2)
        want = float(np.asarray(compiled(x)).sum())
        try:
            t0 = time.time()
            blob = se.serialize(compiled)
            rec["serialize_s"] = round(time.time() - t0, 2)
            rec["blob_bytes"] = len(blob[0]) if isinstance(blob, tuple) \
                else len(blob)
            with open(f"/tmp/aot_{name}.pkl", "wb") as f:
                pickle.dump(blob, f)
            # in-process deserialize
            t0 = time.time()
            loaded = se.deserialize_and_load(*blob) if isinstance(
                blob, tuple) else se.deserialize_and_load(blob)
            rec["deserialize_s"] = round(time.time() - t0, 2)
            got = float(np.asarray(loaded(x)).sum())
            rec["in_process"] = "ok" if got == want else f"WRONG {got}"
        except Exception as e:  # noqa: BLE001
            rec["in_process"] = f"FAIL {type(e).__name__}: {e}"[:300]
        # cross-process
        if "ok" in rec.get("in_process", ""):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "WARMUP_CHILD": name},
                capture_output=True, text=True, timeout=900,
            )
            rec["child_wall_s"] = round(time.time() - t0, 2)
            rec["cross_process"] = (
                r.stdout.strip().splitlines()[-1] if r.returncode == 0
                else f"FAIL rc={r.returncode}: {r.stderr[-300:]}"
            )
        out[name] = rec
        print(f"[aot] {name}: {rec}", flush=True)
    with open("/root/repo/WARMUP_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("[aot] RESULT " + json.dumps(out), flush=True)


def child():
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import serialize_executable as se

    t0 = time.time()
    with open(f"/tmp/aot_{CHILD}.pkl", "rb") as f:
        blob = pickle.load(f)
    try:
        loaded = se.deserialize_and_load(*blob) if isinstance(
            blob, tuple) else se.deserialize_and_load(blob)
        x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
        v = float(np.asarray(loaded(x)).sum())
        print(f"child-ok load+run {time.time()-t0:.2f}s value {v}")
    except Exception as e:  # noqa: BLE001
        print(f"child-FAIL {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    child() if CHILD else main()

"""Opt-in cross-process AOT executable cache (ROPEBWT2_TPU_AOT=1).

The axon backend's persistent compilation cache cannot AOT-load
pallas-containing programs (machine-feature mismatch class), so every
fresh process repays the full remote compile of the batch program —
20 minutes at Gsym capacities.  Explicit executable serialization DOES
round-trip across processes on this toolchain (probe_warmup_aot.py /
WARMUP_r05.json: a child deserializes and runs a pallas program in
~1.4 s), so this module caches serialized executables on disk keyed by
the jit function and its (static args, input avals) signature.

Strictly best-effort: any failure falls back to the normal jit call and
(on save) leaves the cache untouched.  Default OFF — enable with
ROPEBWT2_TPU_AOT=1.
"""

import hashlib
import os
import pickle

import jax

_DIR = os.path.join(
    os.path.expanduser(os.environ.get("ROPEBWT2_TPU_CACHE",
                                      "~/.cache/ropebwt2_tpu")),
    "aot",
)
_loaded = {}


def enabled() -> bool:
    """Opt-in, and only for single-device processes: serialized
    executables capture device assignments/shardings, and the virtual
    multi-device CPU meshes used in tests (and any multi-chip run) must
    not round-trip through a single-device cache entry."""
    if os.environ.get("ROPEBWT2_TPU_AOT", "0") != "1":
        return False
    return len(jax.devices()) == 1


def _key(name, static_kwargs, args):
    h = hashlib.sha256()
    h.update(name.encode())
    h.update(repr(sorted(static_kwargs.items())).encode())
    for a in jax.tree_util.tree_leaves(args):
        h.update(f"{a.shape}/{a.dtype};".encode())
    h.update(
        f"{jax.devices()[0].device_kind}/{len(jax.devices())}".encode()
    )
    return h.hexdigest()[:32]


def cached_call(jit_fn, name, static_kwargs, *args):
    """Call ``jit_fn(*args, **static_kwargs)`` through the disk-backed
    executable cache.  jit_fn must be a jax.jit-wrapped function."""
    key = _key(name, static_kwargs, args)
    exe = _loaded.get(key)
    if exe is None:
        path = os.path.join(_DIR, key + ".pkl")
        if os.path.exists(path):
            try:
                from jax.experimental import serialize_executable as se

                with open(path, "rb") as f:
                    blob = pickle.load(f)
                exe = (se.deserialize_and_load(*blob)
                       if isinstance(blob, tuple)
                       else se.deserialize_and_load(blob))
                _loaded[key] = exe
            except Exception:  # noqa: BLE001 — fall through to compile
                exe = None
        if exe is None:
            compiled = jit_fn.lower(*args, **static_kwargs).compile()
            _loaded[key] = exe = compiled
            try:
                from jax.experimental import serialize_executable as se

                os.makedirs(_DIR, exist_ok=True)
                blob = se.serialize(compiled)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump(blob, f)
                os.replace(tmp, path)
            except Exception:  # noqa: BLE001 — cache miss next time
                pass
    return exe(*args)

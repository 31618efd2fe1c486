"""On-chip numerics audit of every M-sized primitive the plan relies on,
at large M (the v5e toolchain miscompiled the batched window einsum of
cumsum_blocked for >= 2048 windows — guard against siblings).

Each check compares against numpy.  Run on the real TPU.
"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.scan import cumsum_blocked, cummax_blocked, cummin_blocked

rng = np.random.default_rng(2)
dev = jax.devices()[0]
print(f"NUM device {dev.platform}:{dev.device_kind}", flush=True)
fails = 0


def check(tag, got, want, raw=False):
    """raw=True marks a RAW-BUG REPRODUCER: it feeds the miscompiling
    (M, small-c) f32 einsum directly and is EXPECTED to fail on this
    toolchain — product code routes around it by pinning precision=HIGHEST on every exactness-critical contraction (scan._EXACT).
    Only guarded-primitive failures count toward the exit code."""
    global fails
    got = np.asarray(got)
    bad = np.nonzero((got != want).reshape(got.shape[0], -1).any(axis=1))[0]
    kind = "rawbug" if raw else "guarded"
    if bad.size:
        if not raw:
            fails += 1
        print(f"NUM {kind} {tag}: BAD {bad.size} rows, "
              f"first {bad[:3].tolist()}", flush=True)
    else:
        print(f"NUM {kind} {tag}: ok", flush=True)


for m in (1 << 19, 1 << 20, 1 << 21):
    x6 = rng.integers(0, 128, size=(m, 6)).astype(np.int32)
    check(f"cumsum m=2^{m.bit_length()-1}",
          cumsum_blocked(jnp.asarray(x6)), np.cumsum(x6, axis=0))

    xm = rng.integers(0, m, size=(m, 18)).astype(np.int32)
    check(f"cummax m=2^{m.bit_length()-1}",
          cummax_blocked(jnp.asarray(xm)),
          np.maximum.accumulate(xm, axis=0))
    check(f"cummin_rev m=2^{m.bit_length()-1}",
          cummin_blocked(jnp.asarray(xm), reverse=True),
          np.minimum.accumulate(xm[::-1], axis=0)[::-1])

    # plan einsums: Wc/We (ms,ts->mt), sel_rows (mb,bs->ms split-f32),
    # ins_bucket (bm,ms->bs)
    csum = np.cumsum(rng.integers(0, 2, size=(m, 6)).astype(np.int32), axis=0)
    em_lt = rng.integers(0, 2, size=(6, 6)).astype(np.int32)
    got = jnp.einsum("ms,ts->mt", jnp.asarray(csum, jnp.float32),
                     jnp.asarray(em_lt, jnp.float32)).astype(jnp.int32)
    check(f"einsum_ms_ts m=2^{m.bit_length()-1}", got, csum @ em_lt.T, raw=True)

    table = rng.integers(0, 1 << 30, size=(6, 7)).astype(np.int32)
    ohc = np.zeros((m, 6), np.float32)
    sel = rng.integers(0, 6, m)
    ohc[np.arange(m), sel] = 1
    lo = jnp.einsum("mb,bs->ms", jnp.asarray(ohc),
                    jnp.asarray((table & 0xFFF).astype(np.float32)))
    hi = jnp.einsum("mb,bs->ms", jnp.asarray(ohc),
                    jnp.asarray((table >> 12).astype(np.float32)))
    got = (hi.astype(jnp.int32) << 12) + lo.astype(jnp.int32)
    check(f"sel_rows m=2^{m.bit_length()-1}", got, table[sel], raw=True)

    oh32 = np.zeros((m, 6), np.float32)
    oh32[np.arange(m), rng.integers(0, 6, m)] = 1
    got = jnp.einsum("bm,ms->bs", jnp.asarray(ohc.T),
                     jnp.asarray(oh32)).astype(jnp.int64)
    check(f"ins_bucket m=2^{m.bit_length()-1}", got,
          (ohc.T.astype(np.int64) @ oh32.astype(np.int64)))

print(f"NUM done, fails={fails}", flush=True)
sys.exit(1 if fails else 0)

"""On-chip A/B of the merge kernel variants: baseline (align+expand) vs
fused ladder (+ bit-plane counts) vs the packed two-plane kernel, at
cap 2^28 and 2^30.  Verifies on-chip parity of a small prefix before
timing.  Env: KF_CAPS ("28,30"), KF_M (2^21)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.index.flat import PAD_TAIL
from ropebwt2_tpu.index.merge_pallas import merge_pallas
from ropebwt2_tpu.index.merge_pallas_packed import (
    PPAD_ROWS, merge_pallas_packed,
)
from ropebwt2_tpu.index.packed import pack_bwt_np, unpack_bwt_np

M = int(os.environ.get("KF_M", 1 << 21))
caps = [int(c) for c in os.environ.get("KF_CAPS", "28,30").split(",")]
dev = jax.devices()[0]
print(f"KFUSED device {dev.platform}:{dev.device_kind} M={M}", flush=True)

rng = np.random.default_rng(3)


def t_chain(fn, args, reps=6):
    """Median of chained timed calls; output feeds a cheap dependency."""
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out[0][:128])  # true sync
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(out[0][:128])
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3


for lc in caps:
    cap = 1 << lc
    n = cap - (M + (1 << 20))
    syms = np.full(cap + PAD_TAIL, 6, np.int8)
    syms[:n] = rng.integers(0, 6, n, dtype=np.uint8).view(np.int8) % 6
    pos = np.sort(rng.integers(0, n + 1, M)).astype(np.int32)
    sym = rng.integers(0, 6, M).astype(np.int32)
    stream = np.arange(M, dtype=np.int32)
    valid = np.ones(M, bool)
    jb = jnp.asarray(syms)
    jp = jnp.asarray(pack_bwt_np(
        np.concatenate([syms[:cap],
                        np.full(PPAD_ROWS * 256, 6, np.int8)])
    ))
    jn = jnp.asarray(n, jnp.int64)
    jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]

    f_base = jax.jit(lambda b, p, s, t, v: merge_pallas(
        b, p, s, t, v, n=jn, K=128, fused=False))
    f_fused = jax.jit(lambda b, p, s, t, v: merge_pallas(
        b, p, s, t, v, n=jn, K=128, fused=True))
    f_packed = jax.jit(lambda b, p, s, t, v: merge_pallas_packed(
        b, p, s, t, v, n=jn, K=128))

    # parity spot check (prefix): fused + packed vs baseline
    ob, _ = f_base(jb, *jargs)
    of, _ = f_fused(jb, *jargs)
    lim = min(n + M, cap)
    b_np = np.asarray(ob[:lim])
    assert np.array_equal(b_np, np.asarray(of[:lim])), "fused mismatch"
    op, _, _ = f_packed(jp, *jargs)
    p_np = unpack_bwt_np(np.asarray(op))[:lim]
    assert np.array_equal(b_np, p_np), "packed mismatch"
    print(f"KFUSED cap 2^{lc}: parity OK", flush=True)

    tb = t_chain(f_base, (jb, *jargs))
    tf = t_chain(f_fused, (jb, *jargs))
    tp = t_chain(f_packed, (jp, *jargs))
    print(f"KFUSED cap 2^{lc}: base {tb:.1f} ms | fused {tf:.1f} ms | "
          f"packed {tp:.1f} ms", flush=True)

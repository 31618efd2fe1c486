"""On-TPU probe: new merge kernel parity (vs jnp path) + timing.

Run WITHOUT forcing CPU (uses the axon TPU backend).  Single process,
single compile session; prints PROBE lines.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from ropebwt2_tpu.index.flat import PAD_TAIL
from ropebwt2_tpu.index.merge import apply_insertions
from ropebwt2_tpu.index.merge_pallas import merge_pallas
from ropebwt2_tpu.index.rank import build_block_tables

dev = jax.devices()[0]
print(f"PROBE device {dev.platform}:{dev.device_kind}", flush=True)
rng = np.random.default_rng(0)

# --- correctness: small case, int32 positions, K=256 ---
CAP, K = 131072, 256
n, M = 100000, 512
bwt = np.full(CAP + PAD_TAIL, 6, np.int8)
bwt[:n] = rng.integers(0, 6, n)
pos = np.sort(rng.integers(0, n + 1, M)).astype(np.int32)
sym = rng.integers(0, 6, M).astype(np.int32)
stream = np.arange(M, dtype=np.int32)
valid = np.ones(M, bool)
jb = jnp.asarray(bwt)
jargs = [jnp.asarray(x) for x in (pos, sym, stream, valid)]
t0 = time.time()
got, pref = merge_pallas(jb, *jargs, n=jnp.asarray(n, jnp.int32), K=K)
got_h = np.asarray(got); pref_h = np.asarray(pref)
print(f"PROBE compile+run {time.time()-t0:.1f}s", flush=True)
ref = np.asarray(apply_insertions(jb, jnp.asarray(n), *jargs))
refp = np.asarray(build_block_tables(jnp.asarray(ref), K))
lim = n + M
ok_b = bool(np.array_equal(ref[:lim], got_h[:lim]))
ok_p = bool(np.array_equal(refp[: lim // K + 1], pref_h[: lim // K + 1].astype(np.int64)))
print(f"PROBE parity bwt={ok_b} pref={ok_p}", flush=True)
assert ok_b and ok_p

# --- dense case parity (log-shift high bits) ---
M2 = 8192
pos2 = np.sort(np.concatenate([np.zeros(5000, np.int32), rng.integers(0, 4000, M2 - 5000).astype(np.int32)]))
sym2 = rng.integers(0, 6, M2).astype(np.int32)
stream2 = np.arange(M2, dtype=np.int32)
valid2 = np.ones(M2, bool)
jargs2 = [jnp.asarray(x) for x in (pos2, sym2, stream2, valid2)]
got2, pref2 = merge_pallas(jb, *jargs2, n=jnp.asarray(n, jnp.int32), K=K)
ref2 = np.asarray(apply_insertions(jb, jnp.asarray(n), *jargs2))
lim2 = n + M2
ok2 = bool(np.array_equal(ref2[:lim2], np.asarray(got2)[:lim2]))
print(f"PROBE dense parity bwt={ok2}", flush=True)
assert ok2

# --- timing: CAP=2^24, M=2^17, n about half full (mid-round shape) ---
CAPb = 1 << 24
nb_ = CAPb // 2
Mb = 1 << 17
bwtb = np.full(CAPb + PAD_TAIL, 6, np.int8)
bwtb[:nb_] = rng.integers(0, 6, nb_)
posb = np.sort(rng.integers(0, nb_ + 1, Mb)).astype(np.int32)
symb = rng.integers(0, 6, Mb).astype(np.int32)
streamb = np.arange(Mb, dtype=np.int32)
validb = np.ones(Mb, bool)
jbb = jnp.asarray(bwtb)
jargsb = [jnp.asarray(x) for x in (posb, symb, streamb, validb)]
jn = jnp.asarray(nb_, jnp.int32)

@jax.jit
def chain(b, reps):
    def body(i, b):
        nb2, _ = merge_pallas(b, *jargsb, n=jn, K=K)
        return nb2
    return jax.lax.fori_loop(0, reps, body, b)

t0 = time.time()
out = chain(jbb, 1)
_ = np.asarray(out[:8])
print(f"PROBE big compile+1 {time.time()-t0:.1f}s", flush=True)
R = 20
t0 = time.time()
out = chain(jbb, R)
_ = np.asarray(out[:8])
dt = (time.time() - t0) / R
print(f"PROBE merge_ms_per_round {dt*1e3:.2f} (CAP=2^24 n=2^23 M=2^17)", flush=True)

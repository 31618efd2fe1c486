"""Fixed host-side overhead of one insert_multi call on the tunneled TPU:
tiny batch (64 reads x 8bp) so device compute is negligible — what's left
is host packing + transfers + dispatch + the counts() RTT.  Also times the
transfer of a bench-sized buffer and a counts() pull alone.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from ropebwt2_tpu.engine import TpuBwt

dev = jax.devices()[0]
print(f"OVH device {dev.platform}:{dev.device_kind}", flush=True)

rng = np.random.default_rng(0)
tiny = rng.integers(1, 5, size=(64, 8)).astype(np.int8)

# warm compile for the tiny shape
eng = TpuBwt(so=1)
eng.insert_multi(tiny)
eng.counts()

for rep in range(3):
    eng = TpuBwt(so=1)
    t0 = time.time()
    eng.insert_multi(tiny)
    eng.counts()
    print(f"OVH tiny_insert_multi {time.time()-t0:.3f} s", flush=True)

# transfer cost of a bench-sized read buffer (13.4 MB)
buf = np.zeros(1 << 24, np.int8)
jb = jnp.asarray(buf); np.asarray(jb[:1])  # warm
for rep in range(3):
    t0 = time.time()
    jb = jnp.asarray(buf)
    np.asarray(jb[:1])
    print(f"OVH transfer_16MB {time.time()-t0:.3f} s", flush=True)

# a single scalar pull RTT
x = jnp.zeros(8, jnp.int32)
np.asarray(x[:1])
for rep in range(3):
    t0 = time.time()
    np.asarray(x[:1])
    print(f"OVH scalar_pull {time.time()-t0:.3f} s", flush=True)

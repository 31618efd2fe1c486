"""On-TPU microbenchmark of the plan-phase primitive ops.

Each primitive runs R chained reps inside ONE jit (fori_loop), then a
device->host fetch closes the timing (the only trustworthy sync on the
axon backend).  Prints 'OP <name> <us_per_rep>' lines.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from ropebwt2_tpu.index.scan import cumsum_blocked, cumsum_small
from ropebwt2_tpu.index.rank import rank_global

M = 1 << 17
CAP = 1 << 24
K = 256
R = 30
I32 = jnp.int32
rng = np.random.default_rng(0)
perm0 = rng.permutation(M).astype(np.int32)
vals0 = rng.integers(0, 1 << 20, M).astype(np.int32)
tbl6 = rng.integers(0, 1 << 20, (M, 6)).astype(np.int32)
bwt = jnp.asarray(rng.integers(0, 6, CAP).astype(np.int8))
blkp = jnp.asarray(rng.integers(0, 1 << 20, (CAP // K + 1, 6)).astype(np.int32))
qpos = jnp.asarray(np.sort(rng.integers(0, CAP - 1, M)).astype(np.int32))

def timeit(name, f, *args):
    jf = jax.jit(f)
    out = jf(*args)              # compile
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    t0 = time.time()
    out = jf(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = (time.time() - t0) / R
    print(f"OP {name} {dt*1e6:.1f} us", flush=True)

def chain(body):
    def f(x, *rest):
        return jax.lax.fori_loop(
            0, R, lambda i, c: body(c, i, *rest), x)
    return f

p = jnp.asarray(perm0); v = jnp.asarray(vals0); t6 = jnp.asarray(tbl6)

# rotate the permutation each rep so nothing folds
timeit("gather_M_i32", chain(lambda c, i, pp: c[(pp + i) % M]), v, p)
timeit("gather_Mx6_rows", chain(lambda c, i, pp: c[(pp + i) % M, :]), t6, p)
timeit("scatter_set_M", chain(
    lambda c, i, pp: jnp.zeros(M, I32).at[(pp + i) % M].set(c)), v, p)
timeit("scatter_insmap_CAP", chain(
    lambda c, i, q: (jnp.zeros(CAP, jnp.int8).at[q + (i % 3)].set(
        1, mode="drop")[:M].astype(I32) + c)), v, qpos)
timeit("sort_M_i32", chain(lambda c, i: jnp.sort(c) + i), v)
timeit("argsort_M_i32", chain(
    lambda c, i: jnp.argsort(c + i, stable=True).astype(I32)), v)
timeit("cummax_M", chain(lambda c, i: jax.lax.cummax(c + i)), v)
timeit("cumsum_jnp_M", chain(
    lambda c, i: jnp.cumsum(c + i, dtype=I32)), v)
timeit("cumsum_blocked_Mx6", chain(
    lambda c, i: cumsum_blocked((c + i).astype(I32))), t6)
timeit("roll_M", chain(lambda c, i: jnp.roll(c, 1) + i), v)
timeit("take_along_Mx6", chain(
    lambda c, i: c.at[:, 0].set(jnp.take_along_axis(
        c, ((c[:, 1] + i) % 6)[:, None].astype(I32), axis=1).squeeze(1))), t6)
timeit("searchsorted_4k_in_M", chain(
    lambda c, i: c.at[:CAP // 4096 + 1].set(jnp.searchsorted(
        c, jnp.arange(CAP // 4096 + 1, dtype=I32) * 4096
    ).astype(I32))), jnp.asarray(np.sort(vals0)))
timeit("elementwise10_M", chain(
    lambda c, i: c + c // 3 + (c ^ 5) + (c & 7) + c * 3 + (c | i) +
    (c >> 1) + (c << 1) + jnp.maximum(c, i) + jnp.minimum(c, 100)), v)
timeit("rank_global_M", chain(
    lambda c, i: (rank_global(bwt, blkp, (c + qpos) % (CAP - 1), K)[:, 0] & 1)
    + (c & 1)), jnp.zeros(M, I32))
# one-hot bucket einsum (the MXU path in plan_round)
oh = jnp.asarray(rng.integers(0, 2, (M, 6)).astype(np.int32))
timeit("einsum_6xM_Mx6", chain(
    lambda c, i, o: c + jnp.einsum(
        "bm,ms->bs",
        ((o[:, 0] + i) % 2 == 0).astype(jnp.float32)[None, :].repeat(6, 0),
        o.astype(jnp.float32)).astype(I32)[0, 0]), v, oh)

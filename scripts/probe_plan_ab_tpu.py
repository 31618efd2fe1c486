"""On-TPU A/B of the plan Pallas kernels vs the XLA plan_round on synthetic
mid-round states: pinpoints which output array diverges (hardware-only
miscompiles don't show in interpret mode) and times the kernels alone.

One process, batched probes (remote compiles are expensive).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ropebwt2_tpu.engine.bcr import I32, ReadStates, plan_round
from ropebwt2_tpu.engine.plan_pallas import plan_round_tpu, sort_dest, plan_core
from ropebwt2_tpu.index.flat import PAD_TAIL
from ropebwt2_tpu.index.rank import build_block_tables, rank_global
from ropebwt2_tpu.oracle import SO_RLO


def synth(m, cap, k, seed):
    rng = np.random.default_rng(seed)
    n0 = cap // 2
    bwt = np.full(cap + PAD_TAIL, 6, np.int8)
    bwt[:n0] = rng.integers(0, 6, n0)
    jb = jnp.asarray(bwt)
    blkp = build_block_tables(jb, k, dtype=jnp.int32)
    psize = np.full(6, n0 // 6, np.int64)
    psize[5] = n0 - psize[:5].sum()
    pc = np.zeros((6, 6), np.int64)
    for b in range(6):
        pc[b, :] = psize[b] // 6
        pc[b, 5] = psize[b] - pc[b, :5].sum()
    stride = 40
    buf = np.zeros(m * stride, np.int8)
    buf.reshape(m, stride)[:, :32] = rng.integers(1, 5, (m, 32))
    c = np.sort(rng.integers(1, 6, m)).astype(np.int32)
    lo = np.sort(rng.integers(0, n0 // 8, m)).astype(np.int32)
    u = (lo + rng.integers(0, 3, m)).astype(np.int32)
    l = np.maximum(lo - rng.integers(0, 2, m), 0).astype(np.int32)
    pk = ((np.arange(m, dtype=np.int32) * stride) >> 3 << 3) | c
    dead = rng.random(m) < 0.05
    done = rng.random(m) < 0.05
    pk = np.where(dead, -1, pk)
    pk = np.where(~dead & done, pk & ~7, pk)
    reads = ReadStates(l=jnp.asarray(l), u=jnp.asarray(u), pk=jnp.asarray(pk))
    rank_fn = lambda g: rank_global(jb, blkp, jnp.clip(g, 0, n0), k)  # noqa
    return psize, pc, reads, jnp.asarray(buf), rank_fn


def cmp_arrays(tag, a, b, act=None):
    a, b = np.asarray(a), np.asarray(b)
    if act is not None:
        a, b = a[act], b[act]
    if a.shape != b.shape:
        print(f"  {tag}: SHAPE {a.shape} vs {b.shape}", flush=True)
        return False
    bad = np.nonzero(a != b)[0]
    if bad.size:
        i = bad[0]
        print(f"  {tag}: {bad.size}/{a.size} mismatch, first at {i}: "
              f"{a[i]} vs {b[i]}", flush=True)
        return False
    print(f"  {tag}: ok", flush=True)
    return True


def ab(m, cap, k, seed):
    print(f"== M={m} cap={cap} ==", flush=True)
    psize, pc, reads, buf, rank_fn = synth(m, cap, k, seed)
    d = jnp.asarray(3, I32)
    isf = jnp.asarray(False)

    # --- kernel 1 alone: sort_dest vs stable argsort
    t0 = time.time()
    dest = np.asarray(sort_dest(reads.pk))
    t1 = time.time()
    key = np.where(np.asarray(reads.pk) < 0, 0, np.asarray(reads.pk) & 7)
    order = np.argsort(key, kind="stable")
    expect = np.empty(m, np.int64)
    expect[order] = np.arange(m)
    ok1 = cmp_arrays("sort_dest", dest, expect)

    # --- full plan A/B
    a = plan_round(jnp.asarray(psize), jnp.asarray(pc), reads, buf, d, isf,
                   rank_fn, so=SO_RLO)
    b = plan_round_tpu(jnp.asarray(psize), jnp.asarray(pc), reads, buf, d,
                       isf, rank_fn, so=SO_RLO)
    (ra, gXa, syma, sta, acta, iba, nia) = a
    (rb, gXb, symb, stb, actb, ibb, nib) = b
    act = np.asarray(acta)
    ok = cmp_arrays("active", act, np.asarray(actb))
    if ok:
        cmp_arrays("ins_bucket", iba, ibb)
        cmp_arrays("n_ins", np.asarray(nia)[None], np.asarray(nib)[None])
        cmp_arrays("l", ra.l, rb.l)
        cmp_arrays("u", ra.u, rb.u)
        cmp_arrays("pk", ra.pk, rb.pk)
        cmp_arrays("gX", gXa, gXb, act)
        cmp_arrays("sym", syma, symb, act)
        cmp_arrays("stream", sta, stb, act)

    # --- timing: chained kernels (device only, one pull at the end)
    def chain_kernels(nrep):
        pk = reads.pk
        t = time.time()
        for _ in range(nrep):
            dst = sort_dest(pk)
            pk = (pk + dst * 0).astype(jnp.int32)  # chain dependency
        _ = np.asarray(pk[:1])
        return (time.time() - t) / nrep

    chain_kernels(1)
    print(f"  sort_dest: {chain_kernels(20)*1e3:.3f} ms", flush=True)

    poff = jnp.zeros(6, I32)
    def chain_core(nrep):
        l, u, pk = reads.l, reads.u, reads.pk
        srw = jnp.zeros(m, I32)
        t = time.time()
        for _ in range(nrep):
            outs = plan_core(l, u, pk, srw, poff, isf, so=SO_RLO)
            l = outs[0]
        _ = np.asarray(l[:1])
        return (time.time() - t) / nrep

    chain_core(1)
    print(f"  plan_core: {chain_core(20)*1e3:.3f} ms", flush=True)
    return ok1 and ok


def main():
    ok_small = ab(1024, 1 << 16, 256, 1)
    ab(1 << 17, 1 << 22, 128, 2)
    print("small:", "OK" if ok_small else "BAD", flush=True)


if __name__ == "__main__":
    main()

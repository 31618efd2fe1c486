"""A/B one plan_round (and optionally the merge) at large M: the SAME
synthetic mid-round state evaluated on CPU (ground truth; forced cpu
platform in a subprocess) and on the TPU, compared output by output.
Hunts numerics divergence that per-op probes miss (this probe caught the
default-matmul-precision bf16 corruption — see index/scan.py).

CAVEAT: the synthetic state does NOT encode progressive interval
coordinates, so the planned destinations contain duplicates a real round
can never produce; the 'round'/'split' modes' bwt comparison therefore
reports residual diffs wherever CPU and TPU resolve duplicate scatters
differently.  Plan outputs (l/u/pk/gX/stream/...) must match exactly;
end-to-end hardware validation is the engine-vs-reference md5 (see
HACKING.md).

Usage: python scripts/probe_plan_cpu_ab.py [M_log2=19]
Writes/reads /tmp/plan_ab_{in,cpu}.npz.
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

ML2 = int(sys.argv[1]) if len(sys.argv) > 1 else 19
M = 1 << ML2
CAP = 1 << int(os.environ.get("PLAN_AB_CAPL2", ML2 + 7))
K = 128
IN_NPZ = "/tmp/plan_ab_in.npz"
CPU_NPZ = "/tmp/plan_ab_cpu.npz"


def gen():
    rng = np.random.default_rng(9)
    n0 = CAP // 2
    bwt = np.full(CAP + 2048, 6, np.int8)
    bwt[:n0] = rng.integers(0, 6, n0)
    stride = 40
    buf = np.zeros(M * stride, np.int8)
    buf.reshape(M, stride)[:, :32] = rng.integers(1, 5, (M, 32))
    c = np.sort(rng.integers(1, 6, M)).astype(np.int32)
    # RLO-invariant synthetic state: group members share (l, u); use
    # singleton-ish intervals sorted within buckets
    lo = np.sort(rng.integers(0, n0 // 8, M)).astype(np.int32)
    u = lo.copy()
    l = lo.copy()
    pk = (((np.arange(M, dtype=np.int32) * stride) >> 3) << 3) | c
    dead = rng.random(M) < 0.03
    pk = np.where(dead, -1, pk)
    psize = np.full(6, n0 // 6, np.int64)
    psize[5] = n0 - psize[:5].sum()
    pc = np.zeros((6, 6), np.int64)
    for b in range(6):
        pc[b, :] = psize[b] // 6
        pc[b, 5] = psize[b] - pc[b, :5].sum()
    np.savez(IN_NPZ, bwt=bwt, buf=buf, l=l, u=u, pk=pk, psize=psize, pc=pc,
             n0=n0)


def run(tag):
    import jax
    import jax.numpy as jnp

    from ropebwt2_tpu.engine.bcr import I32, ReadStates, plan_round
    from ropebwt2_tpu.index.rank import build_block_tables, rank_global

    z = np.load(IN_NPZ)
    jb = jnp.asarray(z["bwt"])
    blkp = build_block_tables(jb, K, dtype=jnp.int32)
    reads = ReadStates(l=jnp.asarray(z["l"]), u=jnp.asarray(z["u"]),
                       pk=jnp.asarray(z["pk"]))
    n0 = int(z["n0"])
    rank_fn = lambda g: rank_global(  # noqa: E731
        jb, blkp, jnp.clip(g, 0, n0), K
    )

    @jax.jit
    def one(rd):
        return plan_round(
            jnp.asarray(z["psize"]), jnp.asarray(z["pc"]), rd,
            jnp.asarray(z["buf"]), jnp.asarray(3, I32), False, rank_fn,
            so=1,
        )

    rd, gX, sym, stream, active, insb, n_ins = one(reads)
    out = dict(l=rd.l, u=rd.u, pk=rd.pk, gX=gX, sym=sym, stream=stream,
               active=active, insb=insb, n_ins=n_ins)
    return {k: np.asarray(v) for k, v in out.items()}


def main():
    if os.environ.get("PLAN_AB_ROLE") == "cpu":
        np.savez(CPU_NPZ, **run("cpu"))
        return
    gen()
    env = dict(os.environ)
    env.update({"PLAN_AB_ROLE": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "JAX_PLATFORMS": "cpu"})
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    str(ML2)], env=env, check=True)
    import jax

    print(f"AB M=2^{ML2} device {jax.devices()[0].device_kind}", flush=True)
    tpu = run("tpu")
    cpu = np.load(CPU_NPZ)
    act = cpu["active"].astype(bool)
    for k in ("active", "n_ins", "insb", "l", "u", "pk", "sym", "gX",
              "stream"):
        a, b = cpu[k], tpu[k]
        if a.ndim and a.shape[0] == M and k in ("sym", "gX", "stream"):
            a, b = a[act], b[act]
        bad = np.nonzero(np.atleast_1d(a != b))[0]
        if bad.size:
            i = bad[0]
            print(f"AB {k}: BAD {bad.size}, first {i}: "
                  f"{np.atleast_1d(a)[i]} vs {np.atleast_1d(b)[i]}",
                  flush=True)
        else:
            print(f"AB {k}: ok", flush=True)


def run_round(tag):
    """Full bcr_round_impl A/B (CPU: jnp merge; TPU: Pallas merge)."""
    import jax
    import jax.numpy as jnp

    from ropebwt2_tpu.engine.bcr import I32, ReadStates, bcr_round_impl
    from ropebwt2_tpu.index.flat import FlatBwt
    from ropebwt2_tpu.index.rank import build_block_tables

    z = np.load(IN_NPZ)
    jb = jnp.asarray(z["bwt"])
    blkp = build_block_tables(jb, K, dtype=jnp.int32)
    n0 = int(z["n0"])
    st = FlatBwt(bwt=jb, n=jnp.asarray(n0, jnp.int64),
                 psize=jnp.asarray(z["psize"]),
                 pcounts=jnp.asarray(z["pc"]), blk_prefix=blkp)
    reads = ReadStates(l=jnp.asarray(z["l"]), u=jnp.asarray(z["u"]),
                       pk=jnp.asarray(z["pk"]))

    @jax.jit
    def one(s, rd):
        return bcr_round_impl(s, rd, jnp.asarray(z["buf"]),
                              jnp.asarray(3, I32), False, K=K, so=1)

    s2, rd2, n_ins = one(st, reads)
    live = n0 + int(np.asarray(n_ins))
    return dict(bwt=np.asarray(s2.bwt[:live]),
                blkp=np.asarray(s2.blk_prefix[: live // K]),
                n=np.asarray(s2.n), psize=np.asarray(s2.psize),
                pcounts=np.asarray(s2.pcounts),
                l=np.asarray(rd2.l), u=np.asarray(rd2.u),
                pk=np.asarray(rd2.pk))


def main_round():
    if os.environ.get("PLAN_AB_ROLE") == "cpu":
        np.savez(CPU_NPZ, **run_round("cpu"))
        return
    gen()
    env = dict(os.environ)
    env.update({"PLAN_AB_ROLE": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "JAX_PLATFORMS": "cpu", "PLAN_AB_MODE": "round"})
    subprocess.run([sys.executable, os.path.abspath(__file__), str(ML2)],
                   env=env, check=True)
    import jax

    print(f"ABR M=2^{ML2} device {jax.devices()[0].device_kind}", flush=True)
    tpu = run_round("tpu")
    cpu = np.load(CPU_NPZ)
    for k in ("n", "psize", "pcounts", "l", "u", "pk", "bwt", "blkp"):
        a, b = cpu[k], tpu[k]
        bad = np.nonzero(np.atleast_1d((a != b).reshape(a.shape[0], -1).any(axis=1)
                                       if a.ndim > 1 else (a != b)))[0] \
            if a.ndim else np.nonzero(np.atleast_1d(a != b))[0]
        if bad.size:
            i = bad[0]
            print(f"ABR {k}: BAD {bad.size}, first {i}", flush=True)
        else:
            print(f"ABR {k}: ok", flush=True)



def run_round(tag):
    """Full bcr_round_impl A/B (CPU: jnp merge; TPU: Pallas merge)."""
    import jax
    import jax.numpy as jnp

    from ropebwt2_tpu.engine.bcr import I32, ReadStates, bcr_round_impl
    from ropebwt2_tpu.index.flat import FlatBwt
    from ropebwt2_tpu.index.rank import build_block_tables

    z = np.load(IN_NPZ)
    jb = jnp.asarray(z["bwt"])
    blkp = build_block_tables(jb, K, dtype=jnp.int32)
    n0 = int(z["n0"])
    st = FlatBwt(bwt=jb, n=jnp.asarray(n0, jnp.int64),
                 psize=jnp.asarray(z["psize"]),
                 pcounts=jnp.asarray(z["pc"]), blk_prefix=blkp)
    reads = ReadStates(l=jnp.asarray(z["l"]), u=jnp.asarray(z["u"]),
                       pk=jnp.asarray(z["pk"]))

    @jax.jit
    def one(s, rd):
        return bcr_round_impl(s, rd, jnp.asarray(z["buf"]),
                              jnp.asarray(3, I32), False, K=K, so=1)

    s2, rd2, n_ins = one(st, reads)
    live = n0 + int(np.asarray(n_ins))
    return dict(bwt=np.asarray(s2.bwt[:live]),
                blkp=np.asarray(s2.blk_prefix[: live // K]),
                n=np.asarray(s2.n), psize=np.asarray(s2.psize),
                pcounts=np.asarray(s2.pcounts),
                l=np.asarray(rd2.l), u=np.asarray(rd2.u),
                pk=np.asarray(rd2.pk))


def main_round():
    if os.environ.get("PLAN_AB_ROLE") == "cpu":
        np.savez(CPU_NPZ, **run_round("cpu"))
        return
    gen()
    env = dict(os.environ)
    env.update({"PLAN_AB_ROLE": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "JAX_PLATFORMS": "cpu", "PLAN_AB_MODE": "round"})
    subprocess.run([sys.executable, os.path.abspath(__file__), str(ML2)],
                   env=env, check=True)
    import jax

    print(f"ABR M=2^{ML2} device {jax.devices()[0].device_kind}", flush=True)
    tpu = run_round("tpu")
    cpu = np.load(CPU_NPZ)
    for k in ("n", "psize", "pcounts", "l", "u", "pk", "bwt", "blkp"):
        a, b = cpu[k], tpu[k]
        bad = np.nonzero(np.atleast_1d((a != b).reshape(a.shape[0], -1).any(axis=1)
                                       if a.ndim > 1 else (a != b)))[0] \
            if a.ndim else np.nonzero(np.atleast_1d(a != b))[0]
        if bad.size:
            i = bad[0]
            print(f"ABR {k}: BAD {bad.size}, first {i}", flush=True)
        else:
            print(f"ABR {k}: ok", flush=True)


def run_round_split(tag):
    """Like run_round but plan and merge execute as TWO separate jits
    (device-resident handoff) — the candidate mitigation for the fused
    big-program miscompile."""
    import jax
    import jax.numpy as jnp

    from ropebwt2_tpu.engine.bcr import I32, ReadStates, plan_round
    from ropebwt2_tpu.index.flat import FlatBwt
    from ropebwt2_tpu.index.merge_pallas import merge_pallas
    from ropebwt2_tpu.index.rank import build_block_tables, rank_global

    z = np.load(IN_NPZ)
    jb = jnp.asarray(z["bwt"])
    blkp = build_block_tables(jb, K, dtype=jnp.int32)
    n0 = int(z["n0"])
    reads = ReadStates(l=jnp.asarray(z["l"]), u=jnp.asarray(z["u"]),
                       pk=jnp.asarray(z["pk"]))

    @jax.jit
    def plan_j(rd, bwt, bp):
        rank_fn = lambda g: rank_global(  # noqa: E731
            bwt, bp, jnp.clip(g, 0, n0), K
        )
        return plan_round(jnp.asarray(z["psize"]), jnp.asarray(z["pc"]),
                          rd, jnp.asarray(z["buf"]), jnp.asarray(3, I32),
                          False, rank_fn, so=1)

    @jax.jit
    def merge_j(bwt, gX, sym, stream, active):
        return merge_pallas(bwt, gX, sym, stream, active,
                            n=jnp.asarray(n0, jnp.int64), K=K)

    rd2, gX, sym, stream, active, insb, n_ins = plan_j(reads, jb, blkp)
    nbwt, nblkp = merge_j(jb, gX, sym, stream, active)
    live = n0 + int(np.asarray(n_ins))
    return dict(bwt=np.asarray(nbwt[:live]),
                blkp=np.asarray(nblkp[: live // K]),
                l=np.asarray(rd2.l), u=np.asarray(rd2.u),
                pk=np.asarray(rd2.pk))


def main_split():
    gen()
    env = dict(os.environ)
    env.update({"PLAN_AB_ROLE": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "JAX_PLATFORMS": "cpu", "PLAN_AB_MODE": "round"})
    subprocess.run([sys.executable, os.path.abspath(__file__), str(ML2)],
                   env=env, check=True)
    import jax

    print(f"ABS M=2^{ML2} cap=2^{CAP.bit_length()-1} "
          f"{jax.devices()[0].device_kind}", flush=True)
    tpu = run_round_split("tpu")
    cpu = np.load(CPU_NPZ)
    for k in ("l", "u", "pk", "bwt", "blkp"):
        a, b = cpu[k], tpu[k]
        n = min(a.shape[0], b.shape[0])
        a, b = a[:n], b[:n]
        bad = np.nonzero((a != b).reshape(n, -1).any(axis=1))[0]
        print(f"ABS {k}: " + (f"BAD {bad.size}, first {bad[0]}"
                              if bad.size else "ok"), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "split":
        main_split()
    elif os.environ.get("PLAN_AB_MODE") == "round" or (
        len(sys.argv) > 2 and sys.argv[2] == "round"
    ):
        if os.environ.get("PLAN_AB_ROLE") == "cpu":
            np.savez(CPU_NPZ, **run_round("cpu"))
        else:
            os.environ["PLAN_AB_MODE"] = "round"
            main_round()
    else:
        main()

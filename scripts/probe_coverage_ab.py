"""A/B: sustained engine throughput on UNIFORM-random reads vs
COVERAGE-SAMPLED reads (the reference's benchmark datasets are ~47x
coverage resequencing reads — worm = 66.8M x 100bp over a 100 Mbp genome,
README.md:139-152; uniform random reads have no shared suffixes, which is
both unrealistic and the worst case for rank-gather locality).

Both runs use the SAME engine program (identical shapes -> one compile).
Reads: M x L, strand-sampled from one genome at ~47x with 1% substitution
errors (coverage case) vs rng.integers (uniform case).

Env: AB_M (2^17), AB_L (101), AB_PREFILL (8), AB_TIMED (2), AB_COV (47).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def gen_coverage_reads(rng, genome, rc, m, L):
    """Sample m reads of length L from random positions/strands of
    ``genome`` (nt6 codes 1..4) with ~1% substitution errors."""
    starts = rng.integers(0, genome.shape[0] - L, m)
    idx = starts[:, None] + np.arange(L)[None, :]
    fwd = genome[idx]
    # reverse-complement half the reads (strand sampling)
    use_rc = rng.random(m) < 0.5
    rev = rc[idx][:, ::-1]
    reads = np.where(use_rc[:, None], rev, fwd)
    err = rng.random((m, L)) < 0.01
    subs = rng.integers(1, 5, size=(m, L), dtype=np.uint8)
    return np.where(err, subs, reads).astype(np.uint8).view(np.int8)


def main():
    M = int(os.environ.get("AB_M", 1 << 17))
    L = int(os.environ.get("AB_L", 101))
    prefill = int(os.environ.get("AB_PREFILL", 8))
    timed = int(os.environ.get("AB_TIMED", 2))
    cov = float(os.environ.get("AB_COV", 47.0))

    import jax
    from ropebwt2_tpu.engine import TpuBwt

    dev = jax.devices()[0]
    syms = M * (L + 1)
    nb = prefill + timed
    glen = int(M * L * nb / cov)
    rng = np.random.default_rng(7)
    genome = rng.integers(1, 5, glen, dtype=np.uint8)
    rc = (5 - genome).astype(np.uint8)  # complement of codes 1..4
    print(f"AB device {dev.platform}:{dev.device_kind} M={M} L={L} "
          f"genome={glen/1e6:.1f}Mbp cov={cov}", flush=True)

    def run(kind):
        r = np.random.default_rng(3)
        eng = TpuBwt(so=1, K=128)
        eng._plan((nb + 1) * syms)
        for i in range(prefill):
            reads = (r.integers(1, 5, size=(M, L), dtype=np.uint8).view(np.int8)
                     if kind == "uniform"
                     else gen_coverage_reads(r, genome, rc, M, L))
            eng.insert_multi(reads)
        eng.counts()
        walls = []
        for i in range(timed):
            reads = (r.integers(1, 5, size=(M, L), dtype=np.uint8).view(np.int8)
                     if kind == "uniform"
                     else gen_coverage_reads(r, genome, rc, M, L))
            t0 = time.time()
            eng.insert_multi(reads)
            eng.counts()
            walls.append(time.time() - t0)
        best = min(walls)
        print(f"AB {kind}: sustained walls {[round(w,2) for w in walls]} "
              f"-> {syms/best/1e6:.2f} Msym/s", flush=True)
        return best

    # uniform first (carries the compile), then coverage reuses it
    run("uniform")
    run("coverage")
    # second pass to cancel drift
    run("uniform")
    run("coverage")


if __name__ == "__main__":
    main()

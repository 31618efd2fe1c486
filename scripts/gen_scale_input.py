"""Write the exact read set scale_run.py builds (same generator stream:
scripts/readgen.py with the same SCALE_* env) as ACGT text lines, for
feeding the reference binary in the Gsym-scale parity check.

Usage: python scripts/gen_scale_input.py /path/out.txt
Env: SCALE_NREADS (default 10_485_760), SCALE_L (101), SCALE_MBATCH
(2^21 — the draw chunking, part of the stream definition), SCALE_DATA /
SCALE_COV / SCALE_ERR / SCALE_SEED (readgen).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import readgen

LUT = np.frombuffer(b"$ACGTN", dtype=np.uint8)


def main():
    nreads = int(os.environ.get("SCALE_NREADS", 10_485_760))
    L = int(os.environ.get("SCALE_L", 101))
    mbatch = int(os.environ.get("SCALE_MBATCH", 1 << 21))
    out = sys.argv[1]
    gen = readgen.from_env(None, nreads, L, mbatch)
    done = 0
    with open(out, "wb") as f:
        while done < nreads:
            m = min(mbatch, nreads - done)
            reads = gen.batch(m)
            lines = np.empty((m, L + 1), np.uint8)
            lines[:, :L] = LUT[reads]
            lines[:, L] = ord("\n")
            lines.tofile(f)
            done += m
            print(f"[gen] {done}/{nreads}", flush=True)


if __name__ == "__main__":
    main()

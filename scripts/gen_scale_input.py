"""Write the exact read set scale_run.py builds (same RNG stream: seed
12345, SCALE_MBATCH-read draws) as ACGT text lines, for feeding the
reference binary in the Gsym-scale parity check.

Usage: python scripts/gen_scale_input.py /path/out.txt
Env: SCALE_NREADS (default 10_485_760), SCALE_L (101), SCALE_MBATCH (2^21).
"""

import os
import sys

import numpy as np

LUT = np.frombuffer(b"$ACGTN", dtype=np.uint8)


def main():
    nreads = int(os.environ.get("SCALE_NREADS", 10_485_760))
    L = int(os.environ.get("SCALE_L", 101))
    mbatch = int(os.environ.get("SCALE_MBATCH", 1 << 21))
    out = sys.argv[1]
    rng = np.random.default_rng(12345)
    done = 0
    with open(out, "wb") as f:
        while done < nreads:
            m = min(mbatch, nreads - done)
            reads = rng.integers(1, 5, size=(m, L), dtype=np.uint8).view(np.int8)
            lines = np.empty((m, L + 1), np.uint8)
            lines[:, :L] = LUT[reads]
            lines[:, L] = ord("\n")
            lines.tofile(f)
            done += m
            print(f"[gen] {done}/{nreads}", flush=True)


if __name__ == "__main__":
    main()

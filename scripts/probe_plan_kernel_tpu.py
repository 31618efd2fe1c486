"""First on-TPU compile/parity probe of the plan kernels: tiny batch first
(catches Mosaic rejections cheaply), then a bench-shape timed build."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np


def build(m, nread_len, so=1, K=128, plan="1"):
    import subprocess
    code = f'''
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax
from ropebwt2_tpu.engine import TpuBwt
rng = np.random.default_rng(0)
reads = rng.integers(1, 5, size=({m}, {nread_len})).astype(np.int8)
eng = TpuBwt(so={so}, K={K})
t0 = time.time()
eng.insert_multi(reads)
cnt = eng.counts()
t1 = time.time()
assert int(cnt.sum()) == {m} * {nread_len + 1}, cnt
eng2 = TpuBwt(so={so}, K={K})
t2 = time.time()
eng2.insert_multi(reads)
cnt2 = eng2.counts()
t3 = time.time()
import hashlib
h = hashlib.md5(np.asarray(eng2.state.bwt[:eng2.n]).tobytes()).hexdigest()
print(f"RUN m={m} plan={plan} compile+run {{t1-t0:.1f}}s run {{t3-t2:.3f}}s md5 {{h}}", flush=True)
'''
    env = dict(os.environ)
    env["ROPEBWT2_TPU_PLAN"] = plan
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1500)
    out = r.stdout.strip()
    print(out if out else f"FAILED rc={r.returncode}\n{r.stderr[-4000:]}",
          flush=True)
    return r.returncode == 0, out


def main():
    ok, _ = build(1024, 24)  # tiny: cheap Mosaic smoke test
    if not ok:
        print("TINY FAILED — stopping before touching bench shapes")
        return
    ok2, out_on = build(1 << 17, 101, plan="1")
    _, out_off = build(1 << 17, 101, plan="0")
    if ok2:
        h_on = out_on.split("md5 ")[1].split()[0]
        h_off = out_off.split("md5 ")[1].split()[0]
        print("MD5", "MATCH" if h_on == h_off else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()

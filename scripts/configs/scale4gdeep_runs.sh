#!/bin/bash
# 4.49 Gsym deep-coverage artifact on the run-length tier (>2^31 symbols:
# int64 table regime + chunked in-place flush engaged)
cd /root/repo
export SCALE_NREADS=44040192 SCALE_L=101 SCALE_MBATCH=$((1<<19)) SCALE_SO=1 SCALE_MD5=1
export SCALE_DATA=coverage SCALE_COV=150 SCALE_ERR=0.003 SCALE_SEED=777
export ROPEBWT2_TPU_RUNS=1 ROPEBWT2_TPU_RUNS_MARGIN=0.35 ROPEBWT2_TPU_DEFER_R=8
SCALE_JSON=/root/repo/SCALE4GDEEP_r05.json timeout 7200 stdbuf -oL -eL python scripts/scale_run.py 2>&1 | grep -vi warning
echo "expect md5: $(cat /tmp/ref_4gdeep.md5)"

#!/bin/bash
# 8.56 Gsym deep-coverage artifact on the run-length tier
cd /root/repo
export SCALE_NREADS=83886080 SCALE_L=101 SCALE_MBATCH=$((1<<19)) SCALE_SO=1 SCALE_MD5=1
export SCALE_DATA=coverage SCALE_COV=150 SCALE_ERR=0.003 SCALE_SEED=777
export ROPEBWT2_TPU_RUNS=1 ROPEBWT2_TPU_RUNS_MARGIN=0.35
SCALE_JSON=/root/repo/SCALE8G_r05.json timeout 10000 stdbuf -oL -eL python scripts/scale_run.py 2>&1 | grep -vi warning
echo "expect md5: $(cat /tmp/ref_8g.md5)"

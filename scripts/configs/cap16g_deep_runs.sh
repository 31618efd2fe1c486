#!/bin/bash
# 16.9 Gsym deep-coverage capacity demonstration (run tier, chunked flush)
cd /root/repo
export SCALE_NREADS=167772160 SCALE_L=101 SCALE_MBATCH=$((1<<19)) SCALE_SO=1 SCALE_MD5=0
export SCALE_DATA=coverage SCALE_COV=300 SCALE_ERR=0.001 SCALE_SEED=888
export ROPEBWT2_TPU_RUNS=1 ROPEBWT2_TPU_RUNS_MARGIN=0.3
SCALE_JSON=/root/repo/CAP16G_r05.json timeout 12000 stdbuf -oL -eL python scripts/scale_run.py 2>&1 | grep -vi warning

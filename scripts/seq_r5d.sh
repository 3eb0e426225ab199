#!/bin/bash
set -x
cd /root/repo
L=/tmp/seq_r5d
mkdir -p $L
# export_4m: dense sweeps (no compact/dense cond) for ~40% less compile;
# ladder kept (exact physics; movf at 4M = 62720)
SPH_ACTIVE_FRAC=0 timeout 9000 python bench.py export_4m 20 > $L/export4m.log 2>&1
echo DONE

#!/bin/bash
set -x
cd /root/repo
L=/tmp/seq_r5e
mkdir -p $L
# config-5 guaranteed artifact: binned engine (pure XLA, fast compile)
timeout 5400 python bench.py export_4m 6 binned > $L/export4m_binned.log 2>&1
# pallas retry at max compile-minimization (dense + inline ladder-free)
SPH_ACTIVE_FRAC=0 SPH_OVERFLOW_INLINE=1 timeout 9000 python bench.py export_4m 20 > $L/export4m_pallas2.log 2>&1
echo DONE

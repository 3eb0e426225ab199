#!/bin/bash
set -x
cd /root/repo
L=/tmp/seq_r5c
mkdir -p $L
timeout 4800 python bench.py rotated_512k 20 > $L/rot16.log 2>&1
SPH_CELL_CAPACITY=8 timeout 4800 python bench.py rotated_512k 20 > $L/rot8.log 2>&1
SPH_EXACT_OVERFLOW=0 timeout 4800 python bench.py ghost_1m 20 > $L/1m_ballistic.log 2>&1
timeout 1800 python bench.py dam_break_8k 600 > $L/dam600.log 2>&1
timeout 4800 python scripts/profile_pallas.py ghost_1m 10 > $L/prof1m.log 2>&1
echo DONE

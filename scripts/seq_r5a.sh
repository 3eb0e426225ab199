#!/bin/bash
# Round-5 TPU sequence A: smoke -> artifacts -> compile/overflow A/B matrix.
# Run AFTER any heavy CPU job finishes (1-CPU box: tracing contends).
set -x
cd /root/repo
L=/tmp/seq_r5a
mkdir -p $L

timeout 1800 python scripts/tpu_smoke.py expand default_131k ghost_1m \
    > $L/smoke.log 2>&1 || { echo "SMOKE FAILED"; exit 1; }

# 1. dam_break artifact at new defaults (VERDICT #7)
timeout 1800 python bench.py dam_break_8k 200 > $L/dam.log 2>&1

# 2. 131k control at head (run_sweeps refactor sanity + fresh number)
timeout 2400 python bench.py default_131k 20 > $L/131k.log 2>&1

# 3. ghost_1m A/B: overflow inline vs ladder; compile-time 2x2 with
#    dense-only sweeps (SPH_ACTIVE_FRAC=0 removes the compact/dense cond)
timeout 3600 python bench.py ghost_1m 20 > $L/1m_head.log 2>&1
SPH_OVERFLOW_INLINE=1 timeout 3600 python bench.py ghost_1m 20 > $L/1m_inline.log 2>&1
SPH_OVERFLOW_INLINE=1 SPH_ACTIVE_FRAC=0 timeout 3600 python bench.py ghost_1m 20 > $L/1m_inline_dense.log 2>&1
SPH_ACTIVE_FRAC=0 timeout 3600 python bench.py ghost_1m 20 > $L/1m_dense.log 2>&1
SPH_OVERFLOW_INLINE=1 SPH_GATHER_UNIQUE=1 timeout 3600 python bench.py ghost_1m 20 > $L/1m_inline_unique.log 2>&1

# 4. where does rotated_512k overflow sit (edge vs compression)
timeout 3600 python scripts/diag_overflow.py rotated_512k 20 > $L/diag512k.log 2>&1
echo DONE

#!/bin/bash
# Round-5 TPU sequence B: rotated_512k spawn-fix validation + dam artifact
# at RTT-amortizing length + capacity A/B.
set -x
cd /root/repo
L=/tmp/seq_r5b
mkdir -p $L

# dam artifact: 600 substeps so the ~30ms tunnel RTT is <4% of the window
timeout 1800 python bench.py dam_break_8k 600 > $L/dam600.log 2>&1

# rotated_512k at head (new spawn, cap 16)
timeout 4800 python bench.py rotated_512k 20 > $L/rot_head.log 2>&1

# capacity 8 A/B: spawn overflow is now 0 even at 8 -> smaller tables,
# less slot padding; structural change (recompiles)
SPH_CELL_CAPACITY=8 timeout 4800 python bench.py rotated_512k 20 > $L/rot_cap8.log 2>&1

# honest in-context fallback cost: ballistic (physics-wrong) vs head
SPH_EXACT_OVERFLOW=0 timeout 4800 python bench.py ghost_1m 20 > $L/1m_ballistic.log 2>&1

# true full-substep profile with the DCE-fixed carry
timeout 4800 python scripts/profile_pallas.py ghost_1m 10 > $L/prof1m.log 2>&1

# overflow diag on the settled state (edge vs interior, post-spawn-fix)
timeout 3600 python scripts/diag_overflow.py rotated_512k 20 > $L/diag.log 2>&1
echo DONE

#!/bin/bash
# Round-4 overnight TPU queue (one TPU process at a time on this box).
# Waits for the long-BNS chain (train 50k + 2000x400 battery,
# scripts/chain_lbns_v2.sh) to print CHAIN DONE, then runs in sequence:
#   1. release long_bns_v2 (only if the gate battery passed)
#   2. PriorityNet v6 close_boost sweep (cb=3, cb=8) + eval batteries
#      (VERDICT r3 weak-#4: close-sep pairwise >= 0.70 target)
#   3. asym_q anchor-outlier convergence study (nested-sampler effort
#      ladder vs flow-IS; scripts/anchor_convergence.py)
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

until grep -q "CHAIN DONE" /tmp/lbns_chain.log 2>/dev/null; do sleep 60; done

PASSED=$(python -c "
import json, pathlib
p = pathlib.Path('reports/val_long_bns/report.json')
print('yes' if p.exists() and json.loads(p.read_text()).get('passed')
      else 'no')")
if [ "$PASSED" = "yes" ]; then
    python scripts/release_long_bns_v2.py
else
    echo "long-BNS battery missing or failing; release skipped"
fi

for CB in 3 8; do
    timeout 1800 python -m posteriflow_tpu.train.train_priority \
        --outdir model/priority_v6_cb$CB --steps 20000 --close-boost $CB
    timeout 1800 python scripts/test_priority_net.py \
        --model model/priority_v6_cb$CB \
        --out reports/priority_eval_v6_cb$CB.json
done

timeout 7200 python scripts/anchor_convergence.py
echo "QUEUE DONE"

#!/bin/bash
# Round-5 VERDICT#5: PriorityNet v7 (oracle-residual head + time-crowding
# features + hard-pair mining) at the v5/v6 training budget, then the
# standard 20-batch eval with the params-channel oracle measured alongside.
# Target: pairwise [0.0,0.1) >= 0.70 with top-1 >= 0.90 and tau >= 0.78.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== train priority_v7 (30k steps, mine_pool 2, close_boost 2) ==="
timeout 3600 python -m posteriflow_tpu.train.train_priority \
    --outdir model/priority_v7 --steps 30000 --v7 --mine-pool 2 \
    --close-boost 2.0
echo "train exit: $?"

echo "=== eval v7 (natural distribution, oracle included) ==="
timeout 1800 python scripts/test_priority_net.py --model model/priority_v7 \
    --n-batches 20 --out reports/priority_eval_v7.json
echo "eval exit: $?"

echo "=== ALL DONE ==="

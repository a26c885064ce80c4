#!/bin/bash
# Follow-on for the long-BNS v2 gate-bar run: wait for the trainer
# (pid in /tmp/lbns_v2.pid) to exit, then run the full 2000x400 battery
# (VERDICT r3 next-#6). One TPU process at a time on this machine.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

PID=$(cat /tmp/lbns_v2.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "trainer exited; last history record:"
python - <<'EOF'
import json
h = json.load(open("model/long_bns_v2/history.json"))
print(h[-1])
EOF

timeout 7200 python scripts/validate_long_bns.py --model model/long_bns_v2 \
    --n-events 2000 --n-post 400 --out reports/val_long_bns
echo "validate exit: $?"
echo "CHAIN DONE"

#!/bin/bash
# Regenerate the model-specific evidence artifacts on the current
# flagship (npe_r7) — the REGENERATION_PENDING debt. Sequential: one TPU
# process at a time (single tunneled chip).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== twin_grid on npe_r7 ==="
timeout 5400 python scripts/twin_grid.py --ckpt model/npe_r7/ckpt \
    --out analysis/twin_grid.json
echo "twin_grid exit: $?"

echo "=== anchors on npe_r7 (fresh, no resume from the r2 file) ==="
rm -f analysis/anchors.json
timeout 10800 python scripts/make_anchors.py --ckpt model/npe_r7/ckpt \
    --out analysis/anchors.json
echo "anchors exit: $?"

echo "=== importance battery on npe_r7 ==="
timeout 5400 python scripts/importance_validation.py --ckpt model/npe_r7/ckpt \
    --cross-check --out analysis/importance_validation.json
echo "importance exit: $?"

echo "=== ALL DONE ==="

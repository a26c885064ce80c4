#!/bin/bash
# Round-5 VERDICT#4: regenerate analysis/anchors.json on the npe_r7
# flagship with the 13-parameter scoring (run_comparison now scores the
# checkpoint's full non-marginalized set, incl. tilt_1/tilt_2/phi_12/
# phi_jl), then audit the sampler against itself on gw150914_like (two
# independent seeds at the anchor's own nlive). Sequential: one TPU
# process at a time. Log committed per VERDICT r4 next-#6.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

echo "=== anchors (13-param) on npe_r7: fresh file ==="
rm -f analysis/anchors.json
timeout 10800 python scripts/make_anchors.py --ckpt model_release/npe_r7_best \
    --out analysis/anchors.json
echo "anchors exit: $?"

echo "=== sampler self-consistency audit: gw150914_like, 2 seeds ==="
timeout 3600 python scripts/make_anchors.py --ckpt model_release/npe_r7_best \
    --self-check gw150914_like --out analysis/anchors.json
echo "self-check exit: $?"

echo "=== ALL DONE ==="

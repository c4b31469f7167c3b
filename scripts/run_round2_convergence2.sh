#!/bin/bash
# Round-2 convergence fixes: rerun the NDC/LLFF protocol at the reference's
# noise level + dense appearance, and L2G at the standard sigma=0.15.
set -x
cd "$(dirname "$0")/.."
timeout 7200 python train.py --yaml=configs/bat_synthetic_llff.yaml \
    --name=llff_ndc_r2b 2>&1 | tail -8
timeout 3600 python evaluate.py --yaml=configs/bat_synthetic_llff.yaml \
    --name=llff_ndc_r2b --generate_video! 2>&1 | tail -20
timeout 7200 python train.py --yaml=configs/l2g_synthetic_convergence.yaml \
    2>&1 | tail -8
timeout 3600 python evaluate.py --yaml=configs/l2g_synthetic_convergence.yaml \
    --generate_video! 2>&1 | tail -20
echo "CAMPAIGN2 DONE"

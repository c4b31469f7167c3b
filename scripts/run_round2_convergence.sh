#!/bin/bash
# Round-2 convergence evidence (VERDICT #3/#5/#6/#9): runs each protocol
# end-to-end on the real chip and leaves committed-able artifacts under
# output/ (log.jsonl, quant*.json/txt, plots).  Sequential — one TPU.
set -x
cd "$(dirname "$0")/.."

# 1. NDC/LLFF protocol end-to-end (bat_llff_VM_MLP machinery at reduced
#    scale on the forward-facing synthetic scene) + eval w/ test-time optim
timeout 7200 python train.py --yaml=configs/bat_synthetic_llff.yaml \
    --name=llff_ndc_r2 2>&1 | tail -20
timeout 3600 python evaluate.py --yaml=configs/bat_synthetic_llff.yaml \
    --name=llff_ndc_r2 --generate_video! 2>&1 | tail -25

# 2. L2G-BAT at hard noise (sigma=0.30) — does local-to-global help where
#    the plain BAT basin is tight?
timeout 7200 python train.py --yaml=configs/l2g_synthetic_convergence.yaml \
    2>&1 | tail -15

# 3. plain BAT at the same hard noise (paired baseline, re-emitted so the
#    comparison lives in-repo)
timeout 7200 python train.py --yaml=configs/bat_synthetic_convergence_hard.yaml \
    --name=convergence_hard_r2 2>&1 | tail -15

# 4. re-emit the headline 20k convergence run (CONVERGENCE.md tables cite
#    it; round-1 logs were not committed)
timeout 10800 python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --name=convergence_20k_r2 2>&1 | tail -15
timeout 3600 python evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --name=convergence_20k_r2 --generate_video! 2>&1 | tail -25

echo "ALL RUNS DONE"

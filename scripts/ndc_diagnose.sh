#!/bin/bash
# NDC pose-drift diagnostics (round-2): the llff_ndc runs drift away from
# GT monotonically (rot 1.1 -> 35 deg by it 3.8k at sigma=0.02) while the
# euclidean protocol converges to 0.058 deg.  Three 1.5k-iter probes:
#   E1 noise=0, poses learnable       -> does rot grow from ZERO error?
#   E2 noise=0, learnable, NO blur    -> is the blur machinery the force?
#   E3 noise=0.02, poses frozen       -> sanity: field+metric path alone
set -x
cd "$(dirname "$0")/.."
COMMON="--yaml=configs/bat_synthetic_llff.yaml --max_iter=1500 \
  --train_schedule.upsample_iters=[400,700] \
  --train_schedule.update_alphamask_iters=[] \
  --train_schedule.reset_pose_on_iter=100000 \
  --train_schedule.change_n_rays_after_n_iters=400 \
  --freq.scalar=100"
timeout 2000 python train.py $COMMON --camera.noise= --name=ndc_e1 2>&1 | tail -4
timeout 2000 python train.py $COMMON --camera.noise= --c2f_mode=None \
  --blur_2d! --edge_mask_on_render_loss! --name=ndc_e2 2>&1 | tail -4
timeout 2000 python train.py $COMMON --optim.lr_pose=0 --name=ndc_e3 2>&1 | tail -4
echo DIAG DONE

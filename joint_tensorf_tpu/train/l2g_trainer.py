"""L2G-BAT trainer: the reference's l2g_bat.Model over the BAT Trainer.

Reuses the whole BAT schedule/phase machinery (the reference's
l2g_bat.Model subclasses bat.Model) and swaps the jitted step for the
local-to-global one (train/l2g.py).  Training poses come from the
per-view rigid registration of the warped ray points
(l2g_bat.py:63-68 ``get_all_training_poses`` reads the optimised-pose
table, not an se3 embedding).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Options
from ..data.base import SceneData
from .l2g import L2GConfig, L2GState, init_l2g_state, make_l2g_train_step
from .optim import adam_init
from .step import StepConfig
from .trainer import Trainer


class L2GTrainer(Trainer):
    def __init__(self, opt: Options, train_data: SceneData,
                 val_data: Optional[SceneData] = None):
        super().__init__(opt, train_data, val_data)
        arch = opt.arch
        self.l2g_cfg = L2GConfig(
            embedding_dim=int(arch.get("embedding_dim", 32)),
            layers_warp=tuple(int(x) for x in
                              arch.get("layers_warp", [64, 64, 6])),
            skip_warp=tuple(int(x) for x in arch.get("skip_warp", [])),
            error_map_size=int(opt.get("error_map_size", 0) or 0),
            global_alignment_weight=float(
                opt.loss_weight.get("global_alignment", 1.0) or 0.0),
        )
        # non-blender datasets start from identity poses (l2g_bat.py:37-38);
        # the procedural synthetic scene stands in for blender here
        if opt.data.dataset not in ("blender", "synthetic"):
            eye = jnp.broadcast_to(
                jnp.eye(3, 4, dtype=self.pose_base.dtype),
                self.pose_base.shape)
            self.pose_base = eye
        ikey, self.key = jax.random.split(self.key)
        self.state = init_l2g_state(
            ikey, self.vm_cfg, self.l2g_cfg, self.resolution, self.bbox,
            self.n_views, self.pose_base,
            init_scale=float(opt.arch.tensorf.get("volume_init_scale", 0.1)),
            init_bias=float(opt.arch.tensorf.get("volume_init_bias", 0.0)))
        # the base-class __init__ probed the bbox compaction budget against
        # the interim TrainState, where get_all_training_poses (which reads
        # state.optimised_poses here) fails and the probe self-disables —
        # re-probe now that the L2G state exists
        self._refresh_bbox_k()

    def _refresh_bbox_k(self):
        if not hasattr(self.state, "optimised_poses"):
            # base-class __init__ runs before the L2G state replaces the
            # interim TrainState; the real probe happens at the end of
            # __init__ (and at phase transitions as usual)
            self.compact_k_bbox = None
            return
        super()._refresh_bbox_k()

    def _make_raw_step(self, cfg: StepConfig, jit: bool):
        return make_l2g_train_step(cfg, self.l2g_cfg, self.vm_cfg, self.head,
                                   jit=jit,
                                   ray_sharding=self._ray_sharding())

    def _rebuild_opt_state(self, state: L2GState) -> L2GState:
        return dataclasses.replace(
            state,
            scene_opt=adam_init(state.params.field),
            pose_opt=state.pose_opt,
            pose_grad_accum=state.pose_grad_accum)

    def get_all_training_poses(self):
        """(pose, pose_GT) from the registered per-view table
        (l2g_bat.py:63-68)."""
        return self.state.optimised_poses, self.gt_poses

    def _near_far(self):
        """Rescale the blender depth range by the current optimised-camera
        diameter (l2g_bat.py:133-139 recomputes depth_range from the
        registered poses every forward).  Non-blender datasets keep the
        base near/far (plus any near-plane schedule)."""
        if self.opt.data.dataset in ("blender", "synthetic") and \
                getattr(self, "state", None) is not None:
            from .l2g import l2g_depth_range
            return list(l2g_depth_range(self.state.optimised_poses,
                                        self.near_far))
        return super()._near_far()

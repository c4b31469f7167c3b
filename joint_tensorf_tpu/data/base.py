"""Dataset containers and loading dispatch.

The whole training split is prefetched into device memory as dense arrays
(the reference does the same, nerf.py:38-40); per-iteration ray batches are
sliced on-device.  Loaders produce a SceneData on host (numpy) and the
trainer uploads it once.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SceneData:
    """One split of a scene, fully materialized.

    images: [B, 3, H, W] float32 in [0,1]
    poses:  [B, 3, 4] world->cam GT poses
    intr:   [B, 3, 3]; intr_inv: [B, 3, 3]
    """
    images: np.ndarray
    poses: np.ndarray
    intr: np.ndarray
    intr_inv: np.ndarray
    near_far: tuple[float, float]
    H: int
    W: int

    @property
    def n_views(self) -> int:
        return self.images.shape[0]


def scale_intrinsics(intr: np.ndarray, raw_hw, target_hw,
                     center_crop: float | None = None) -> np.ndarray:
    """Adjust intrinsics for center-crop then resize (reference data/base.py:92-119)."""
    intr = intr.copy().astype(np.float32)
    raw_h, raw_w = raw_hw
    if center_crop is not None:
        crop_h, crop_w = int(raw_h * center_crop), int(raw_w * center_crop)
        intr[..., 0, 2] -= (raw_w - crop_w) / 2
        intr[..., 1, 2] -= (raw_h - crop_h) / 2
        raw_h, raw_w = crop_h, crop_w
    h, w = target_hw
    intr[..., 0, :] *= w / raw_w
    intr[..., 1, :] *= h / raw_h
    return intr


def resize_images(images: np.ndarray, target_hw) -> np.ndarray:
    """[B, C, H, W] -> [B, C, h, w] bilinear (antialias off, like torchvision
    Resize default interpolation on tensors in the reference stack)."""
    import jax
    import jax.numpy as jnp

    h, w = target_hw
    if images.shape[-2:] == (h, w):
        return images
    out = jax.image.resize(jnp.asarray(images),
                           images.shape[:-2] + (h, w), method="bilinear")
    return np.asarray(out)


def load_dataset(opt, split: str = "train", subset: int | None = None) -> SceneData:
    """Dispatch by opt.data.dataset name (mirrors the reference's module
    dispatch, base.py:27)."""
    name = opt.data.dataset
    if name == "blender":
        from . import blender
        return blender.load(opt, split, subset)
    if name == "llff":
        from . import llff
        return llff.load(opt, split, subset)
    if name == "synthetic":
        from . import synthetic
        return synthetic.load(opt, split, subset)
    if name == "t2":
        from . import t2
        return t2.load(opt, split, subset)
    if name == "iphone":
        from . import iphone
        return iphone.load(opt, split, subset)
    raise ValueError(f"unknown dataset {name!r}")

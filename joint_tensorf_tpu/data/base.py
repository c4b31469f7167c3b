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


def generate_augmentation(opt, rng: np.random.Generator):
    """Sample one augmentation (reference data/base.py:74-90).

    Returns dict(brightness, contrast, saturation, hue, flip, rot_angle)
    with factors drawn uniformly like torchvision ColorJitter.get_params.
    """
    aug_cfg = opt.data.get("augment") or {}
    def _rng(lo, hi):
        return float(rng.uniform(lo, hi))
    b = float(aug_cfg.get("brightness") or 0.0)
    c = float(aug_cfg.get("contrast") or 0.0)
    s = float(aug_cfg.get("saturation") or 0.0)
    h = float(aug_cfg.get("hue") or 0.0)
    return {
        "brightness": _rng(1 - b, 1 + b),
        "contrast": _rng(1 - c, 1 + c),
        "saturation": _rng(1 - s, 1 + s),
        "hue": _rng(-h, h),
        "flip": bool(rng.standard_normal() > 0) if aug_cfg.get("hflip")
                else False,
        "rot_angle": ((rng.random() * 2 - 1) * float(aug_cfg["rotate"])
                      if aug_cfg.get("rotate") else 0.0),
    }


def apply_color_jitter(images: np.ndarray, aug: dict) -> np.ndarray:
    """Brightness/contrast/saturation/hue on [..., 3, H, W] float in [0,1]
    (numpy port of the torchvision functional ops the reference applies,
    data/base.py:92-101)."""
    img = images.astype(np.float32)
    img = np.clip(img * aug["brightness"], 0, 1)
    gray = (0.299 * img[..., 0, :, :] + 0.587 * img[..., 1, :, :]
            + 0.114 * img[..., 2, :, :])
    img = np.clip(aug["contrast"] * img
                  + (1 - aug["contrast"]) * gray.mean(axis=(-2, -1),
                                                      keepdims=True)[..., None, :, :],
                  0, 1)
    img = np.clip(aug["saturation"] * img
                  + (1 - aug["saturation"]) * gray[..., None, :, :], 0, 1)
    if aug["hue"]:
        # hue rotation via the YIQ approximation (exact HSV shift is what
        # torchvision does; for the small |hue|<=0.5 jitters used in
        # configs the YIQ rotation matches closely and stays vectorized)
        theta = 2 * np.pi * aug["hue"]
        u, w = np.cos(theta), np.sin(theta)
        t = np.array([
            [0.299 + 0.701 * u + 0.168 * w,
             0.587 - 0.587 * u + 0.330 * w,
             0.114 - 0.114 * u - 0.497 * w],
            [0.299 - 0.299 * u - 0.328 * w,
             0.587 + 0.413 * u + 0.035 * w,
             0.114 - 0.114 * u + 0.292 * w],
            [0.299 - 0.300 * u + 1.250 * w,
             0.587 - 0.588 * u - 1.050 * w,
             0.114 + 0.886 * u - 0.203 * w]], np.float32)
        img = np.clip(np.einsum("ij,...jhw->...ihw", t, img), 0, 1)
    if aug.get("flip"):
        img = img[..., ::-1]
    return np.ascontiguousarray(img)


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

"""Structured metric logging with optional TensorBoard / wandb sinks.

The reference triple-logs to TensorBoard + wandb + visdom (SURVEY.md §5.5).
Here the primary sink is JSONL (always on, machine-readable); TensorBoard
and wandb attach when their packages are importable and enabled in config.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional


class MetricLogger:
    def __init__(self, out_dir: str, opt=None):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl_path = os.path.join(out_dir, "log.jsonl")
        self.tb = None
        self.wandb = None

        if opt is not None and opt.get("tb_logging", True):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir=os.path.join(out_dir, "tb"))
            except Exception:
                self.tb = None
        if opt is not None and opt.get("wandb", False):
            try:
                import wandb

                wandb.init(project=str(opt.get("wandb_name", "joint_tensorf_tpu")),
                           group=str(opt.get("group", "default")),
                           name=str(opt.get("name", "run")),
                           config=opt.to_dict() if hasattr(opt, "to_dict")
                           else None,
                           resume=bool(opt.get("resume", False)))
                self.wandb = wandb
            except Exception:
                self.wandb = None

    def log_scalars(self, metrics: dict[str, Any], step: int,
                    split: str = "train"):
        line = {k: (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()}
        line["it"] = step
        line["split"] = split
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        if self.tb is not None:
            for k, v in metrics.items():
                try:
                    self.tb.add_scalar(f"{split}/{k}", float(v), step)
                except (TypeError, ValueError):
                    pass
        if self.wandb is not None:
            self.wandb.log({f"{split}.{k}": v for k, v in metrics.items()},
                           step=step)

    def log_image(self, name: str, image, step: int, split: str = "train"):
        """image: [H, W, 3] float in [0,1]."""
        import numpy as np

        img = np.clip(np.asarray(image), 0, 1)
        if self.tb is not None:
            try:
                self.tb.add_image(f"{split}/{name}",
                                  img.transpose(2, 0, 1), step)
            except Exception:
                pass
        if self.wandb is not None:
            try:
                self.wandb.log({f"{split}.{name}": self.wandb.Image(img)},
                               step=step)
            except Exception:
                pass

    def summary(self, metrics: dict[str, Any]):
        with open(os.path.join(self.out_dir, "summary.json"), "w") as f:
            json.dump({k: float(v) if hasattr(v, "__float__") else v
                       for k, v in metrics.items()}, f, indent=2)
        if self.wandb is not None:
            for k, v in metrics.items():
                self.wandb.run.summary[k] = v

    def close(self):
        if self.tb is not None:
            self.tb.flush()
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


def profile_trace(out_dir: str):
    """Context manager: jax.profiler trace for TensorBoard/XProf
    (the reference's torch.profiler integration, SURVEY.md §5.1)."""
    import jax

    return jax.profiler.trace(os.path.join(out_dir, "jax_trace"),
                              create_perfetto_link=False)

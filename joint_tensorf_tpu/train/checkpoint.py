"""Checkpoint save/restore.

Reference semantics (util.py:120-184, tensorf.py:491-524): because factor
shapes change during training, the checkpoint stores (a) every array of the
train state keyed by its pytree path (shapes implicit), (b) the schedule
side-channel (iter, n_voxel_list, lrs, resolution, bbox) needed to rebuild
the phase machinery, and (c) the packed alpha-mask volume.  Restore rebuilds
arrays directly from the stored shapes — no replay of reset() is needed
because our state is data, not modules.

Format: a single .npz (arrays) + embedded JSON metadata string.

Writes can be asynchronous (``async_write=True``): the device->host
transfer happens inline (cheap; the arrays must be snapshotted before the
next optimizer step mutates them), while compression + disk IO run on a
single background writer thread so periodic snapshots never stall the train
loop — the TPU-native analogue of the reference's synchronous per-iter
snapshot copies (util.py:160-184).  Writes are atomic (tmp + rename) and
ordered (one writer thread); call ``wait_for_pending()`` before reading a
checkpoint back or exiting.
"""
from __future__ import annotations

import concurrent.futures as _futures
import json
import os
import shutil
import threading

import jax
import jax.numpy as jnp
import numpy as np

_writer: _futures.ThreadPoolExecutor | None = None
_pending: list[_futures.Future] = []
_writer_lock = threading.Lock()


def _submit_write(path: str, payload: dict, snapshot_path: str | None):
    global _writer
    with _writer_lock:
        if _writer is None:
            _writer = _futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer")
        _pending.append(_writer.submit(_write_npz, path, payload,
                                       snapshot_path))
        _pending[:] = [f for f in _pending if not f.done()]


def _write_npz(path: str, payload: dict, snapshot_path: str | None = None):
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)
    if snapshot_path is not None:
        shutil.copyfile(path, snapshot_path)


def wait_for_pending():
    """Block until all queued async checkpoint writes hit disk (re-raises
    the first writer exception, if any)."""
    with _writer_lock:
        pending = list(_pending)
        _pending.clear()
    for f in pending:
        f.result()


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str, trainer, async_write: bool = False,
                    snapshot_path: str | None = None) -> None:
    arrays, _ = _flatten_with_paths(trainer.state)
    meta = {
        "it": trainer.it,
        "n_voxel_list": trainer.n_voxel_list,
        "n_voxels": trainer.n_voxels,
        "resolution": trainer.resolution,
        "alphamask_resolution": trainer.alphamask_resolution,
        "lr_index": trainer.lr_index,
        "lr_basis": trainer.lr_basis,
        "tv_density_weight": trainer.tv_density_weight,
        "tv_color_weight": trainer.tv_color_weight,
        "n_samples": trainer.n_samples,
        "has_alpha_mask": trainer.alpha_mask is not None,
        "rng_state": trainer.rng_np.bit_generator.state,
    }
    payload = {f"state/{k}": v for k, v in arrays.items()}
    payload["key"] = np.asarray(trainer.key)
    if trainer.pose_noise is not None:
        payload["pose_noise"] = np.asarray(trainer.pose_noise)
    if trainer.alpha_mask is not None:
        grid = np.asarray(trainer.alpha_mask.grid) > 0.5
        payload["alpha_mask/packed"] = np.packbits(grid.reshape(-1))
        payload["alpha_mask/shape"] = np.asarray(grid.shape)
        payload["alpha_mask/aabb"] = np.asarray(trainer.alpha_mask.aabb)
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    if async_write:
        _submit_write(path, payload, snapshot_path)
    else:
        _write_npz(path, payload, snapshot_path)


def save_simple_checkpoint(path: str, trainer, async_write: bool = False,
                           snapshot_path: str | None = None) -> None:
    """Checkpoint for trainers without phase machinery (barf/nerf/planar):
    params + optimizer moments + iteration."""
    arrays, _ = _flatten_with_paths({"params": trainer.params,
                                     "opt_state": trainer.opt_state})
    payload = {f"state/{k}": v for k, v in arrays.items()}
    payload["key"] = np.asarray(trainer.key)
    if getattr(trainer, "pose_noise", None) is not None:
        payload["pose_noise"] = np.asarray(trainer.pose_noise)
    meta = {"it": trainer.it,
            "rng_state": trainer.rng_np.bit_generator.state}
    payload["meta_json"] = np.frombuffer(json.dumps(meta).encode(),
                                         dtype=np.uint8)
    if async_write:
        _submit_write(path, payload, snapshot_path)
    else:
        _write_npz(path, payload, snapshot_path)


def restore_simple_checkpoint(path: str, trainer) -> None:
    wait_for_pending()
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta_json"]).decode())
    arrays = {k[len("state/"):]: data[k] for k in data.files
              if k.startswith("state/")}
    tree = {"params": trainer.params, "opt_state": trainer.opt_state}
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for pth, leaf in flat:
        key = "/".join(str(p) for p in pth)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key}")
        leaves.append(jnp.asarray(arrays[key]))
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    trainer.params = restored["params"]
    trainer.opt_state = restored["opt_state"]
    trainer.it = int(meta["it"])
    trainer.rng_np.bit_generator.state = meta["rng_state"]
    trainer.key = jnp.asarray(data["key"])
    if "pose_noise" in data.files:
        from ..geometry import poses as pose_ops

        trainer.pose_noise = jnp.asarray(data["pose_noise"])
        trainer.pose_base = pose_ops.compose([trainer.pose_noise,
                                              trainer.gt_poses])


def restore_checkpoint(path: str, trainer) -> None:
    """Restore a trainer in place (shapes are rebuilt from the stored
    arrays; optimizer moments restore exactly)."""
    wait_for_pending()
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta_json"]).decode())

    # rebuild the state pytree: use the current state's structure as the
    # template but take array values (and shapes) from the checkpoint
    arrays = {k[len("state/"):]: data[k] for k in data.files
              if k.startswith("state/")}
    flat, treedef = jax.tree_util.tree_flatten_with_path(trainer.state)
    new_leaves = []
    for pth, leaf in flat:
        key = "/".join(str(p) for p in pth)
        if key in arrays:
            new_leaves.append(jnp.asarray(arrays[key]))
        else:
            raise KeyError(f"checkpoint missing leaf {key}")
    trainer.state = jax.tree_util.tree_unflatten(treedef, new_leaves)

    trainer.it = int(meta["it"])
    trainer.n_voxel_list = list(meta["n_voxel_list"])
    trainer.n_voxels = int(meta["n_voxels"])
    trainer.resolution = list(meta["resolution"])
    trainer.alphamask_resolution = list(meta["alphamask_resolution"])
    trainer.lr_index = float(meta["lr_index"])
    trainer.lr_basis = float(meta["lr_basis"])
    trainer.tv_density_weight = float(meta["tv_density_weight"])
    trainer.tv_color_weight = float(meta["tv_color_weight"])
    trainer.n_samples = int(meta["n_samples"])
    trainer.rng_np.bit_generator.state = meta["rng_state"]
    trainer.key = jnp.asarray(data["key"])
    if "pose_noise" in data.files:
        from ..geometry import poses as pose_ops

        trainer.pose_noise = jnp.asarray(data["pose_noise"])
        trainer.pose_base = pose_ops.compose([trainer.pose_noise,
                                              trainer.gt_poses])
    if meta["has_alpha_mask"]:
        from ..models.alpha_mask import AlphaMask, pack_neighborhoods

        shape = tuple(int(s) for s in data["alpha_mask/shape"])
        n = int(np.prod(shape))
        grid = np.unpackbits(data["alpha_mask/packed"])[:n].reshape(shape)
        grid = jnp.asarray(grid, jnp.float32)
        trainer.alpha_mask = AlphaMask(
            grid=grid, aabb=jnp.asarray(data["alpha_mask/aabb"]),
            packed=pack_neighborhoods(grid))
        trainer.compact_k = trainer._probe_compact_k()
        trainer.app_k_dyn = trainer._probe_app_k()
    # restored leaves are host arrays: re-place them onto the mesh with
    # their PartitionSpecs so a sharded trainer resumes sharded (the
    # save->restore->resume cycle is crossed by dryrun_multichip)
    if getattr(trainer, "mesh", None) is not None:
        trainer._shard_state()
    trainer._step_cfg = None  # force step rebuild with restored shapes

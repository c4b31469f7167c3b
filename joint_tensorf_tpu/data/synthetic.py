"""Procedural synthetic scenes with analytically-known geometry.

No external datasets ship with this repo, so tests and benchmarks use a
procedural stand-in for the Blender split: a handful of colored Gaussian
blobs inside the scene bbox, rendered with exact quadrature from
known GT poses arranged on a viewing sphere.  Convergence of PSNR (and of
pose error under synthetic se(3) perturbations) against this scene
exercises the same code paths the Blender configs do.
"""
from __future__ import annotations

import numpy as np

from .base import SceneData


def look_at_pose(cam_pos, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """world->cam [3,4] with the camera looking along its +z axis."""
    p = np.asarray(cam_pos, dtype=np.float32)
    z = np.asarray(target, dtype=np.float32) - p
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, dtype=np.float32), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])          # rows: camera axes in world coords
    t = -R @ p
    return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)


def sphere_poses(n: int, radius: float = 4.0, elevation: float = 0.35,
                 seed: int = 0):
    """n poses around the origin with per-view elevation variation.

    Elevations are varied (like Blender's hemisphere captures) so the camera
    centers are NOT coplanar — a planar ring makes sim(3) Procrustes
    alignment degenerate (a flip about the ring plane also aligns the
    centers), which would corrupt pose-error evaluation.
    """
    rng = np.random.default_rng(seed)
    thetas = np.linspace(0, 2 * np.pi, n, endpoint=False)
    thetas = thetas + rng.uniform(0, 2 * np.pi / n)
    elevs = elevation + rng.uniform(-0.25, 0.45, n)
    poses = []
    for th, el in zip(thetas, elevs):
        p = radius * np.array([np.cos(th) * np.cos(el),
                               np.sin(el),
                               np.sin(th) * np.cos(el)])
        poses.append(look_at_pose(p))
    return np.stack(poses)


def facing_poses(n: int, radius: float = 4.0, spread: float = 0.45,
                 seed: int = 0):
    """LLFF-style forward-facing capture: camera centers on a small disc at
    distance ``radius`` in front of the scene, all looking at jittered
    points near the origin (the geometry regime of the reference's LLFF
    runs — NDC rays, shallow camera baseline)."""
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(n):
        dx, dy = rng.uniform(-spread, spread, 2)
        dz = rng.uniform(-0.25, 0.25)
        p = np.array([dx, dy, -(radius + dz)], dtype=np.float32)
        target = rng.uniform(-0.15, 0.15, 3).astype(np.float32)
        poses.append(look_at_pose(p, target=target))
    return np.stack(poses)


class BlobField:
    """Analytic GT field: colored Gaussian blobs with 3D color texture.

    The texture matters: perfectly smooth radially-symmetric blobs give
    weak/ambiguous pose-alignment signals (the field can absorb pose error),
    while high-frequency color variation makes photometric bundle adjustment
    well-determined — the regime the Blender scenes are in.
    """

    def __init__(self, n_blobs: int = 5, seed: int = 0, extent: float = 1.0,
                 density_scale: float = 40.0, texture: bool = True):
        rng = np.random.default_rng(seed)
        self.centers = rng.uniform(-extent * 0.6, extent * 0.6, (n_blobs, 3))
        self.radii = rng.uniform(0.15, 0.35, n_blobs) * extent
        self.colors = rng.uniform(0.2, 1.0, (n_blobs, 3))
        self.density_scale = density_scale
        self.texture = texture
        # random-phase sinusoidal 3D texture (a few octaves)
        self.tex_freqs = rng.uniform(3.0, 9.0, (3, 4, 3))   # [rgb, octave, xyz]
        self.tex_phase = rng.uniform(0, 2 * np.pi, (3, 4))

    def sigma_rgb(self, pts):
        """pts: [..., 3] -> (sigma [...], rgb [..., 3])."""
        import jax.numpy as jnp

        d2 = jnp.sum((pts[..., None, :] - self.centers) ** 2, axis=-1)
        g = jnp.exp(-0.5 * d2 / (self.radii**2))              # [..., K]
        sigma = self.density_scale * jnp.sum(g, axis=-1)
        w = g / (jnp.sum(g, axis=-1, keepdims=True) + 1e-8)
        rgb = w @ self.colors
        if self.texture:
            # multiplicative high-frequency modulation, mean-one
            arg = jnp.einsum("...d,cod->...co", pts, self.tex_freqs)
            tex = jnp.mean(jnp.sin(arg + self.tex_phase), axis=-1)  # [..., 3]
            rgb = jnp.clip(rgb * (1.0 + 0.45 * tex), 0.0, 1.0)
        return sigma, rgb


class SolidField:
    """Analytic GT field: opaque textured solids (spheres + boxes).

    Near-step sigmoid-shell density gives sharp silhouettes and occlusion
    boundaries — the pose-identifiability regime the Blender scenes live
    in.  The soft BlobField's semi-transparent Gaussians leave a few
    degrees of joint pose/field ambiguity (the field can absorb a smooth
    warp); solid occluders pin the poses (see docs/CONVERGENCE.md).
    """

    def __init__(self, n_shapes: int = 9, seed: int = 0, extent: float = 1.0,
                 density_scale: float = 500.0, shell: float = 0.02,
                 texture: bool = True):
        rng = np.random.default_rng(seed)
        self.centers = rng.uniform(-extent * 0.65, extent * 0.65,
                                   (n_shapes, 3))
        self.sizes = rng.uniform(0.12, 0.30, n_shapes) * extent
        self.is_box = (np.arange(n_shapes) % 2 == 0).astype(np.float32)
        self.colors = rng.uniform(0.15, 1.0, (n_shapes, 3))
        self.density_scale = density_scale
        self.shell = shell
        self.texture = texture
        self.tex_freqs = rng.uniform(4.0, 14.0, (3, 5, 3))
        self.tex_phase = rng.uniform(0, 2 * np.pi, (3, 5))

    def sigma_rgb(self, pts):
        """pts: [..., 3] -> (sigma [...], rgb [..., 3])."""
        import jax
        import jax.numpy as jnp

        delta = pts[..., None, :] - self.centers              # [..., K, 3]
        d_sphere = jnp.linalg.norm(delta, axis=-1) - self.sizes
        d_box = jnp.max(jnp.abs(delta), axis=-1) - self.sizes
        d = self.is_box * d_box + (1 - self.is_box) * d_sphere
        occ = jax.nn.sigmoid(-d / self.shell)                 # [..., K]
        sigma = self.density_scale * jnp.sum(occ, axis=-1)
        w = jax.nn.softmax(-d / 0.08, axis=-1)                # nearest shape
        rgb = w @ self.colors
        if self.texture:
            arg = jnp.einsum("...d,cod->...co", pts, self.tex_freqs)
            tex = jnp.mean(jnp.sin(arg + self.tex_phase), axis=-1)
            rgb = jnp.clip(rgb * (1.0 + 0.5 * tex), 0.0, 1.0)
        return sigma, rgb


class ParallaxField:
    """Analytic GT for the forward-facing protocol with LLFF-like depth
    structure.

    The round-2/3 `facing` runs drifted even from exact-GT pose starts
    (docs/CONVERGENCE.md): that scene's content occupies a thin metric
    slab (depth ratio ~1.4:1 from the camera disc), so the NDC volume is
    nearly a single plane and joint optimization slides along the
    plane-sweep family.  Real LLFF captures (fern, flower) pin poses with
    near-to-far parallax spanning ~5-10x depth.  This field reproduces
    that regime: solids stratified over metric depth ~2.2-12 from the
    camera disc, a textured floor plane running through the depth range,
    and a far textured backdrop wall — every image mixes near and far
    content, so a pose shift cannot be absorbed by a depth-consistent
    field warp.
    """

    def __init__(self, n_shapes: int = 10, seed: int = 0,
                 density_scale: float = 300.0, texture: bool = True):
        rng = np.random.default_rng(seed)
        # cameras sit near z = -4 (facing_poses) looking toward +z;
        # stagger shape centers over z in [-1.8, 8] => metric depth 2.2-12
        zs = np.linspace(-1.8, 8.0, n_shapes) + rng.uniform(
            -0.4, 0.4, n_shapes)
        # lateral spread grows with depth so shapes stay inside the FOV
        # (half-width ~ 0.45 * depth at focal 1.1W) without occluding
        # everything behind them
        lat = 0.38 * (zs + 4.0)
        self.centers = np.stack([
            rng.uniform(-1, 1, n_shapes) * lat,
            rng.uniform(-0.75, 0.9, n_shapes) * lat * 0.8,
            zs], axis=-1)
        # angular size roughly constant: radius grows with depth
        self.sizes = (0.10 + 0.05 * rng.random(n_shapes)) * (zs + 4.0) * 0.55
        self.is_box = (np.arange(n_shapes) % 2 == 0).astype(np.float32)
        self.colors = rng.uniform(0.15, 1.0, (n_shapes, 3))
        self.density_scale = density_scale
        self.texture = texture
        self.tex_freqs = rng.uniform(1.0, 6.0, (3, 5, 3))
        self.tex_phase = rng.uniform(0, 2 * np.pi, (3, 5))
        # floor at y = -1.6 - 0.12*(z+4) (slightly sloped), backdrop wall
        # at z = 15 (metric depth 19); both textured via the same octaves
        self.floor_y0 = -1.6
        self.floor_slope = -0.12
        self.wall_z = 15.0

    def sigma_rgb(self, pts):
        import jax
        import jax.numpy as jnp

        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        delta = pts[..., None, :] - self.centers              # [..., K, 3]
        d_sphere = jnp.linalg.norm(delta, axis=-1) - self.sizes
        d_box = jnp.max(jnp.abs(delta), axis=-1) - self.sizes
        d = self.is_box * d_box + (1 - self.is_box) * d_sphere
        # shell thickness scales with size so far shapes stay resolvable
        # by the GT quadrature (render step ~0.02 * depth_range)
        shell = 0.015 * (self.sizes / self.sizes.min())
        occ = jax.nn.sigmoid(-d / shell)                      # [..., K]
        # floor + wall as half-space shells
        floor_d = y - (self.floor_y0 + self.floor_slope * (z + 4.0))
        wall_d = self.wall_z - z
        occ_floor = jax.nn.sigmoid(-floor_d / 0.05)
        occ_wall = jax.nn.sigmoid(-wall_d / 0.12)
        sigma = self.density_scale * (
            jnp.sum(occ, axis=-1) + occ_floor + occ_wall)
        # color: nearest shape, floor, wall weighted by signed distance
        d_all = jnp.concatenate(
            [d, floor_d[..., None], wall_d[..., None]], axis=-1)
        w = jax.nn.softmax(-d_all / 0.06, axis=-1)
        colors = jnp.concatenate(
            [jnp.asarray(self.colors),
             jnp.array([[0.55, 0.45, 0.35], [0.45, 0.55, 0.70]])], axis=0)
        rgb = w @ colors
        if self.texture:
            # anisotropic scaling keeps texture frequency roughly uniform
            # in IMAGE space across depth (world frequency / depth)
            depth = jnp.maximum(z + 4.0, 0.5)[..., None]
            p = pts / depth * 4.0
            arg = jnp.einsum("...d,cod->...co", p, self.tex_freqs)
            tex = jnp.mean(jnp.sin(arg + self.tex_phase), axis=-1)
            rgb = jnp.clip(rgb * (1.0 + 0.5 * tex), 0.0, 1.0)
        return sigma, rgb


def render_analytic(field: BlobField, pose, intr_inv, H: int, W: int,
                    near: float, far: float, n_samples: int = 256,
                    white_bg: bool = True, chunk: int = 65536):
    """Exact-quadrature render of the analytic field from one pose."""
    import jax
    import jax.numpy as jnp

    from ..geometry.rays import get_center_and_ray

    centers, dirs = get_center_and_ray(H, W, jnp.asarray(pose)[None],
                                       jnp.asarray(intr_inv)[None])
    centers, dirs = centers[0], dirs[0]

    @jax.jit
    def render_chunk(c, d):
        z = jnp.linspace(near, far, n_samples)
        pts = c[:, None, :] + d[:, None, :] * z[None, :, None]
        sigma, rgb = field.sigma_rgb(pts)
        dists = jnp.full_like(z, (far - near) / n_samples)
        alpha = 1 - jnp.exp(-sigma * dists)
        T = jnp.cumprod(1 - alpha + 1e-10, axis=-1)
        T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], -1)
        wgt = alpha * T
        acc = wgt.sum(-1)
        out = (wgt[..., None] * rgb).sum(-2)
        if white_bg:
            out = out + (1 - acc[..., None])
        return jnp.clip(out, 0, 1)

    outs = []
    n = centers.shape[0]
    pad = (-n) % chunk
    c = jnp.pad(centers, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)))
    for s in range(0, n + pad, chunk):
        outs.append(render_chunk(c[s:s + chunk], d[s:s + chunk]))
    img = jnp.concatenate(outs)[:n].reshape(H, W, 3)
    return np.asarray(img)


# Version tag of the procedural-scene GENERATOR (not the call arguments):
# bump on any change to _make_scene_impl / the field classes / the pose
# generators so stale disk-cache entries cannot masquerade as current
# scenes.  v1 == the round-3 generator (unchanged since the cache landed).
_SCENE_CACHE_VERSION = 1


def make_scene(n_views: int = 12, H: int = 64, W: int = 64,
               near: float = 2.0, far: float = 6.0, seed: int = 0,
               n_blobs: int = 5, n_samples: int = 256,
               pose_seed: int | None = None,
               kind: str = "blobs") -> SceneData:
    # Disk cache: the analytic GT render runs on the accelerator and costs
    # ~10 min at 100 views x 400^2 — every process re-paid it (and hung
    # when the TPU tunnel was down).  The scene is a pure function of the
    # arguments, so cache the arrays keyed by them.
    import os
    cache_dir = os.environ.get("JTF_SCENE_CACHE",
                               os.path.join("output", ".scene_cache"))
    # _SCENE_CACHE_VERSION must be bumped whenever _make_scene_impl, the
    # field classes, or the pose generators change — the key is otherwise
    # only a function of the call arguments, and a stale hit would silently
    # corrupt convergence/PSNR comparisons across code versions.
    key = (f"{kind}_v{n_views}_{H}x{W}_n{near:g}_f{far:g}_s{seed}"
           f"_b{n_blobs}_ns{n_samples}_p{pose_seed}_cv{_SCENE_CACHE_VERSION}")
    path = os.path.join(cache_dir, key + ".npz")
    try:
        z = np.load(path)
        print(f"[scene] cache hit {path}")
        return SceneData(images=z["images"], poses=z["poses"], intr=z["intr"],
                         intr_inv=z["intr_inv"], near_far=(near, far),
                         H=H, W=W)
    except Exception:
        pass
    scene = _make_scene_impl(n_views, H, W, near, far, seed, n_blobs,
                             n_samples, pose_seed, kind)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp.npz"
        np.savez(tmp, images=scene.images, poses=scene.poses,
                 intr=scene.intr, intr_inv=scene.intr_inv)
        os.replace(tmp, path)
    except Exception:
        pass
    return scene


def _make_scene_impl(n_views: int, H: int, W: int, near: float, far: float,
                     seed: int, n_blobs: int, n_samples: int,
                     pose_seed: int | None, kind: str) -> SceneData:
    # the field is determined by ``seed`` alone so train/val splits of the
    # same scene share geometry; only the camera ring varies with pose_seed
    gt_near, gt_far = near, far
    if kind == "parallax":
        field = ParallaxField(seed=seed)
        # depth range spans the backdrop wall; keep quadrature below the
        # smallest shell (~0.017) over the 20-unit range
        n_samples = max(n_samples, 1280)
    elif kind in ("solids", "facing"):
        field = SolidField(seed=seed)
        # the 0.02-unit sigmoid shells need finer quadrature than the
        # smooth blobs: keep the GT sample spacing below the shell width
        n_samples = max(n_samples, 512)
    else:
        field = BlobField(n_blobs=n_blobs, seed=seed)
    if kind in ("facing", "parallax"):
        # forward-facing capture for the NDC/LLFF protocol: the returned
        # SceneData.near_far stays the caller's (NDC) depth range, while the
        # analytic GT is rendered in metric space around the camera disc
        poses = facing_poses(n_views,
                             seed=seed if pose_seed is None else pose_seed)
        gt_near, gt_far = (2.0, 6.2) if kind == "facing" else (1.9, 20.5)
    else:
        poses = sphere_poses(n_views,
                             seed=seed if pose_seed is None else pose_seed)
    focal = 1.1 * W
    intr = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                    dtype=np.float32)
    intr = np.broadcast_to(intr, (n_views, 3, 3)).copy()
    intr_inv = np.linalg.inv(intr).astype(np.float32)

    images = np.stack([
        render_analytic(field, poses[i], intr_inv[i], H, W, gt_near, gt_far,
                        n_samples=n_samples).transpose(2, 0, 1)
        for i in range(n_views)
    ])
    return SceneData(images=images.astype(np.float32), poses=poses,
                     intr=intr, intr_inv=intr_inv, near_far=(near, far),
                     H=H, W=W)


def load(opt, split: str = "train", subset: int | None = None) -> SceneData:
    n = opt.data.get("n_views", 12)
    if split != "train":
        n = opt.data.get("val_sub") or max(2, n // 4)
    H, W = opt.data.image_size
    near, far = opt.nerf.depth.range
    seed = opt.data.get("seed", 0)
    pose_seed = seed + (0 if split == "train" else 1000)
    # data.scene selects the analytic field; Blender scene names inherited
    # from parent configs (e.g. "lego") map to the default soft blobs
    kind = str(opt.data.get("scene", "blobs"))
    if kind not in ("blobs", "solids", "facing", "parallax"):
        kind = "blobs"
    scene = make_scene(n_views=n, H=H, W=W, near=float(near), far=float(far),
                       seed=seed, pose_seed=pose_seed, kind=kind)
    if subset:
        scene.images = scene.images[:subset]
        scene.poses = scene.poses[:subset]
        scene.intr = scene.intr[:subset]
        scene.intr_inv = scene.intr_inv[:subset]
    return scene

"""Scene ingestion: RGB-D images -> filtered, centered SoA point cloud.

Device-side fusion of the reference's load_rgbd_data_sampled (reference:
src/rgbd.cpp:179-281): back-projection, LINEMOD-style depth normals, voxel
centroid downsample, radius outlier removal, z-clip, per-point
probability/normal/color refetch by reprojection, and probability/normal
rejection — emitting fixed-capacity padded arrays. The neighbor grid for
LCP scoring is built on the host afterwards (the data is host-resident
during image I/O anyway).

One deliberate divergence: zero-depth pixels are dropped *before* the voxel
filter instead of carrying a ghost cluster at the origin through it like the
reference does (rgbd.cpp:208-230 back-projects every pixel, then relies on
the z<=0 clip at rgbd.cpp:242); the ghost points influence nothing there
either because of that later clip.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import MatchConfig
from .io import image as imio
from .ops import geometry, normals as normals_ops, voxel
from .ops.densefield import DenseField, build_dense_field
from .ops.gridhash import NeighborGrid, build_neighbor_grid
from .utils.host import fetch


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ScenePack:
    pos: jax.Array          # [P, 3] centered
    normal: jax.Array       # [P, 3]
    rgb: jax.Array          # [P, 3]
    pixel: jax.Array        # [P, 2] (row, col)
    class_prob: jax.Array   # [P] — mutable copy (instance path decays it)
    edge_prob: jax.Array    # [P]
    valid: jax.Array        # [P]
    centroid: jax.Array     # [3]
    grid: NeighborGrid      # exact restricted-NN structure (cell = eps)
    field: DenseField       # dense NN field (fast scoring path)
    icp_grid: NeighborGrid  # wider NN structure for ICP correspondences
    edge_free: jax.Array    # [H, W] bool — flood fill may enter (edge==255)
    has_edge: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cfg",))
def _scene_pipeline(rgb, depth_u16, probs_u16, edge_u8, cfg: MatchConfig):
    """probs_u16: [O, H, W] stacked per-object probability maps (O=1 for the
    single-object path). A point stays valid if ANY object's probability
    clears the threshold; per-object sub-threshold probabilities are zeroed
    (multi-object mode note: in per-object reference runs such points are
    absent from that object's cloud entirely; here they remain as geometry
    but carry zero weight for that object)."""
    fx, cx, fy, cy = cfg.camera.as_tuple()
    depth = depth_u16.astype(jnp.float32) * cfg.depth_scale
    pts_img = geometry.backproject_depth(depth, fx, cx, fy, cy)
    # normals on the RAW u16 values, exactly like the reference feeding
    # the unscaled depth image to RgbdNormals (rgbd.cpp:205-206): the
    # LINEMOD difference threshold is 50 RAW units, and directions are
    # invariant to the uniform depth_scale
    nrm_img, nrm_ok = normals_ops.depth_normals(
        depth_u16.astype(jnp.float32), fx, cx, fy, cy, window=5
    )

    h, w = depth.shape
    pos = pts_img.reshape(-1, 3)
    valid = (depth > 0).reshape(-1)

    # voxel centroid downsample (pcl::VoxelGrid, rgbd.cpp:227-230)
    pos, valid, _ = voxel.voxel_downsample_centroid(pos, valid, cfg.voxel_size)

    # radius outlier removal (rgbd.cpp:232-236)
    valid = voxel.radius_outlier_mask(
        pos, valid,
        2.0 * cfg.voxel_size + cfg.outlier_radius_bias,
        cfg.outlier_min_neighbors,
    )

    # z-clip (rgbd.cpp:242)
    valid &= (pos[:, 2] > 0) & (pos[:, 2] <= cfg.max_scene_depth)

    # reproject centroids to fetch per-pixel attributes (rgbd.cpp:245-261)
    pix = geometry.project_points(pos, fx, cx, fy, cy)
    row = jnp.clip(pix[:, 0], 0, h - 1)
    col = jnp.clip(pix[:, 1], 0, w - 1)
    in_img = (pix[:, 0] >= 0) & (pix[:, 0] < h) & (pix[:, 1] >= 0) & (pix[:, 1] < w)
    valid &= in_img

    class_prob = (
        probs_u16[:, row, col].astype(jnp.float32) * cfg.probability_scale
    )  # [O, P']
    class_prob = jnp.where(class_prob >= cfg.class_threshold, class_prob, 0.0)
    edge_prob = (255.0 - edge_u8[row, col].astype(jnp.float32)) / 255.0
    rgbv = rgb[row, col].astype(jnp.float32)

    valid &= jnp.any(class_prob > 0, axis=0)

    if cfg.scene_normal_mode == "depth":
        nrm = nrm_img[row, col]
        nok = nrm_ok[row, col]
        valid &= nok & jnp.any(nrm != 0.0, axis=-1)
    else:
        # radius-PCA over the downsampled cloud (see MatchConfig docs);
        # camera-facing orientation needs the uncentered positions
        nrm, nok = normals_ops.grid_pca_normals(
            pos, valid,
            cfg.scene_normal_radius_factor * cfg.voxel_size,
        )
        valid &= nok

    # compact valid points to the front (stable), pad to max_scene_points
    valid_total = jnp.sum(valid.astype(jnp.int32))
    order = jnp.argsort(~valid, stable=True)
    take = order[: cfg.max_scene_points]
    pos = pos[take]
    valid = valid[take]
    nrm = nrm[take]
    class_prob = jnp.where(valid[None, :], class_prob[:, take], 0.0)
    edge_prob = jnp.where(valid, edge_prob[take], 0.0)
    rgbv = rgbv[take]
    pixel = jnp.stack([row, col], axis=-1)[take]

    # centroid shift (stocs.cpp:943-964)
    cnt = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    centroid = jnp.sum(jnp.where(valid[:, None], pos, 0.0), axis=0) / cnt
    pos = jnp.where(valid[:, None], pos - centroid, 0.0)

    kept = jnp.sum(valid.astype(jnp.int32))
    return dict(
        pos=pos, normal=jnp.where(valid[:, None], nrm, 0.0), rgb=rgbv,
        pixel=pixel, class_prob=class_prob, edge_prob=edge_prob,
        valid=valid, centroid=centroid, count=kept,
        truncated=valid_total - kept,  # points silently dropped by the cap
    )


def load_scene(
    rgb_path: str,
    depth_path: str,
    class_prob_path: str,
    edge_path: Optional[str],
    cfg: MatchConfig,
) -> ScenePack:
    """Host image reads + the fused device pipeline + host grid build.

    Missing edge map -> zeros (all free space), matching the reference's
    dispatch (src/stocs.cpp:114-118: absent file -> zero image; note an
    all-zero *uint8* edge image means edge_probability==1 everywhere, which
    the class path never reads)."""
    pack, _probs = load_scene_multi(
        rgb_path, depth_path, [class_prob_path], edge_path, cfg
    )
    return pack


def load_scene_multi(
    rgb_path: str,
    depth_path: str,
    class_prob_paths,
    edge_path: Optional[str],
    cfg: MatchConfig,
):
    """Multi-object variant: one shared scene geometry (union of the
    per-object probability supports), per-object probability vectors.
    Returns (ScenePack, probs [O, P]); the pack's class_prob holds object 0's
    vector for single-object compatibility."""
    rgb = imio.read_rgb(rgb_path)
    depth = imio.read_u16(depth_path)
    probs = np.stack([imio.read_u16(p) for p in class_prob_paths])
    has_edge = edge_path is not None and os.path.exists(edge_path)
    if has_edge:
        edge = imio.read_u8(edge_path)
    else:
        edge = np.zeros(depth.shape, np.uint8)

    out = _scene_pipeline(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(probs),
        jnp.asarray(edge), cfg,
    )
    # ONE batched fetch for everything the host-side grid builds need
    # (utils/host.py: serial np.asarray reads cost ~25 ms each on the
    # tunneled TPU; this is also the process's first, poisoning D2H)
    host = fetch(dict(
        truncated=out["truncated"], pos=out["pos"], valid=out["valid"],
        normal=out["normal"],
        # bake object-0 class probabilities into the scoring structures
        # only when that is unambiguous (single probability map): scorers
        # may then be called with scene_class_prob=None to skip the prob
        # gathers. Multi-object scenes score each object with its own
        # prob vector, and the instance path scores with decayed copies —
        # both keep gathering.
        prob0=(out["class_prob"][0] if len(class_prob_paths) == 1
               else None),
    ))
    truncated = int(host["truncated"])
    if truncated > 0:
        from .utils.log import warn

        warn(
            f"scene capacity max_scene_points dropped {truncated} valid "
            f"points — raise MatchConfig.max_scene_points",
            dropped=truncated, cap=cfg.max_scene_points,
        )
    host_pos = host["pos"]
    host_valid = host["valid"]
    host_nrm = host["normal"][host_valid]
    host_prob = (
        host["prob0"][host_valid] if host["prob0"] is not None else None
    )
    grid = build_neighbor_grid(
        host_pos[host_valid], cell_size=cfg.distance_threshold,
        normal=host_nrm,
        prob=host_prob,
    )
    field = build_dense_field(
        host_pos[host_valid], host_nrm,
        cfg.distance_threshold,
        prob=host_prob,
    )
    icp_grid = build_neighbor_grid(
        host_pos[host_valid], cell_size=cfg.icp_max_corr_dist
    )
    pack = ScenePack(
        pos=out["pos"], normal=out["normal"], rgb=out["rgb"],
        pixel=out["pixel"], class_prob=out["class_prob"][0],
        edge_prob=out["edge_prob"], valid=out["valid"],
        centroid=out["centroid"], grid=grid, field=field, icp_grid=icp_grid,
        edge_free=jnp.asarray(edge == 255),
        has_edge=has_edge,
    )
    return pack, out["class_prob"]

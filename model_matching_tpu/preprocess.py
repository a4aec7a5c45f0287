"""Offline model preprocessing: normals -> voxel downsample -> PPF table.

The reference's pre_process_model (reference: src/stocs.cpp:28-84): PCL
radius-search normal estimation on the raw cloud, inward->outward flip,
VoxelGrid downsample (averaging every field), NaN-normal drop + unit scale
on load, the O(M^2) PPF map build with 128-bin fan-out, and the artifact
writes. Here: batched PCA normals (device math over host neighbor lists),
segment-mean voxel downsampling, and the dense-table build of
ppf_table.build_ppf_table; artifacts are model_search.ply + ppf_table.npz.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .config import PreprocessConfig
from .io import ply
from .ops import normals as normals_ops, voxel
from .ppf_table import build_ppf_table, save_ppf_table


def preprocess_model(
    src_ply_path: str,
    dst_model_path: str,
    dst_table_path: str,
    cfg: PreprocessConfig,
    verbose: bool = True,
) -> Tuple[int, float]:
    """Returns (num_model_points, max_pairwise_distance)."""
    pos, _ignored_normals, rgb = ply.read_ply_cloud(src_ply_path, scale=1.0)
    n = pos.shape[0]
    if rgb is None:
        rgb = np.full((n, 3), 128.0, np.float32)

    # PCA normals over the raw cloud, oriented outward from the model-frame
    # origin (PCL orients toward the origin viewpoint; the reference then
    # negates, src/stocs.cpp:47-52). Device grid-PCA (same op as the scene
    # path); degenerate neighborhoods become NaN so they poison their voxel
    # and get dropped on load like PCL's NaN normals.
    dn, dok = normals_ops.grid_pca_normals(
        jnp.asarray(pos), jnp.asarray(np.ones(n, bool)),
        cfg.normal_radius, cell_cap=cfg.normal_max_neighbors,
        orient="outward",
    )
    nrm = np.array(np.asarray(dn))
    nrm[~np.asarray(dok)] = np.nan

    # voxel centroid downsample averaging normals and color like PCL's
    # XYZRGBNormal VoxelGrid (src/stocs.cpp:54-57)
    vpos, vvalid, vattrs = voxel.voxel_downsample_centroid(
        jnp.asarray(pos),
        jnp.asarray(np.ones(n, bool)),
        cfg.voxel_size,
        attrs={"normal": jnp.asarray(nrm),  # NaNs poison their voxel's mean,
               # matching PCL's NaN centroid -> dropped on load
               "rgb": jnp.asarray(rgb)},
    )
    vvalid = np.asarray(vvalid)
    vpos = np.asarray(vpos)[vvalid]
    vnrm = np.asarray(vattrs["normal"])[vvalid]
    vrgb = np.asarray(vattrs["rgb"])[vvalid]

    # drop non-finite normals + renormalize + scale to meters
    # (load_ply_model semantics, src/rgbd.cpp:12-33)
    finite = np.isfinite(vnrm).all(axis=1)
    norms = np.linalg.norm(vnrm, axis=1)
    keep = finite & (norms > 1e-12)
    vpos, vnrm, vrgb = vpos[keep], vnrm[keep], vrgb[keep]
    vnrm = vnrm / np.linalg.norm(vnrm, axis=1, keepdims=True)
    vpos = vpos * np.float32(cfg.model_scale)

    if verbose:
        print(f"After sampling |M| = {len(vpos)}")

    table, max_distance = build_ppf_table(
        vpos, vnrm, cfg.ppf_tr_discretization, cfg.ppf_rot_discretization
    )
    if verbose:
        print(f"max distance: {max_distance:.6f}")
        print(
            f"table: pairs={table.num_pairs} "
            f"exist_slots={table.exist_keys.shape[0]} "
            f"probes=({table.exist_max_probes},{table.bin_max_probes})"
        )

    os.makedirs(os.path.dirname(dst_model_path) or ".", exist_ok=True)
    ply.write_ply(dst_model_path, vpos, vnrm, vrgb, scale=1.0)
    save_ppf_table(
        dst_table_path, table,
        extra_meta={
            "source": os.path.basename(src_ply_path),
            "num_points": int(len(vpos)),
            "max_distance": float(max_distance),
            "voxel_size": cfg.voxel_size,
            "normal_radius": cfg.normal_radius,
            "model_scale": cfg.model_scale,
        },
    )
    return len(vpos), max_distance

"""BOP-format ground-truth ingestion (scene_gt.json / scene_camera.json).

The reference bundles no ground-truth poses (reference README.md:4 links
the STOCS paper instead), so the accuracy half of BASELINE.json cannot be
proven on the bundled fixtures alone. Real YCB-Video / LINEMOD ground
truth is distributed in the BOP challenge layout
(https://bop.felk.cvut.cz, bop_toolkit docs/bop_datasets_format.md):

    scene_gt.json     {"<im_id>": [{"cam_R_m2c": [9 row-major floats],
                                    "cam_t_m2c": [3 floats, MILLIMETERS],
                                    "obj_id": int}, ...], ...}
    scene_camera.json {"<im_id>": {"cam_K": [9 row-major floats],
                                   "depth_scale": float}, ...}

This module parses that layout into the framework's conventions (meters;
[4, 4] model-to-camera matrices — the same frame as
best_pose_candidate_*.txt), so the moment a BOP-format dataset is
mounted, `cli.py eval <est> <scene_gt.json> --im-id N --obj-id K`
produces the ADD/ADD-S table with no extra tooling.
"""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np


def load_scene_gt(path: str) -> Dict[int, List[dict]]:
    """Parse scene_gt.json -> {im_id: [{"obj_id": int, "pose": [4,4] f32
    model-to-camera, METERS}, ...]}. cam_t_m2c is converted mm -> m; the
    rotation is the row-major 3x3 as stored."""
    with open(path) as f:
        raw = json.load(f)
    out: Dict[int, List[dict]] = {}
    for im_id, entries in raw.items():
        lst = []
        for e in entries:
            r = np.asarray(e["cam_R_m2c"], np.float64).reshape(3, 3)
            t = np.asarray(e["cam_t_m2c"], np.float64) / 1000.0
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = r
            m[:3, 3] = t
            lst.append({"obj_id": int(e["obj_id"]), "pose": m})
        out[int(im_id)] = lst
    return out


def load_scene_camera(path: str) -> Dict[int, dict]:
    """Parse scene_camera.json -> {im_id: {"K": [3,3] f32,
    "depth_scale": float}}. BOP's depth_scale multiplies the stored
    uint16 depth into MILLIMETERS; the returned depth_to_m multiplies it
    straight into meters (MatchConfig.depth_scale's convention)."""
    with open(path) as f:
        raw = json.load(f)
    out: Dict[int, dict] = {}
    for im_id, e in raw.items():
        k = np.asarray(e["cam_K"], np.float64).reshape(3, 3)
        ds = float(e.get("depth_scale", 1.0))
        out[int(im_id)] = {
            "K": k,  # float64: intrinsics must round-trip exactly
            "depth_scale": ds,
            "depth_to_m": ds / 1000.0,
        }
    return out


def camera_intrinsics(scene_camera: Dict[int, dict], im_id: int):
    """BOP cam_K -> config.CameraIntrinsics (fx, cx, fy, cy order,
    stocs_match_one_object.cpp:20)."""
    from ..config import CameraIntrinsics

    k = scene_camera[im_id]["K"]
    return CameraIntrinsics(
        fx=float(k[0, 0]), cx=float(k[0, 2]),
        fy=float(k[1, 1]), cy=float(k[1, 2]),
    )


def gt_poses(scene_gt: Dict[int, List[dict]], im_id: int,
             obj_id: int) -> np.ndarray:
    """All ground-truth [4, 4] poses of `obj_id` in image `im_id` (a BOP
    image may hold several instances of one object — the packed fixture's
    eight dove boxes would be eight entries). Raises KeyError if the
    image or object is absent."""
    entries = scene_gt[im_id]
    poses = [e["pose"] for e in entries if e["obj_id"] == obj_id]
    if not poses:
        raise KeyError(
            f"no ground truth for obj_id={obj_id} in im_id={im_id} "
            f"(present: {sorted({e['obj_id'] for e in entries})})"
        )
    return np.stack(poses).astype(np.float32)

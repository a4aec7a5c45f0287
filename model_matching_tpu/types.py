"""Structure-of-arrays point-cloud containers.

The reference's per-point object (`Point3D`, reference: include/point3d.hpp:11-92)
holds position, normal, rgb, source pixel and three probabilities. On TPU the
same data lives as a struct of fixed-shape arrays with a validity mask so the
whole cloud is one XLA value; "vector<Point3D>" loops become masked array ops.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointCloud:
    """Padded SoA cloud. All arrays share leading dim N (the pad capacity);
    `valid` marks live entries."""

    pos: jax.Array        # [N, 3] float32
    normal: jax.Array     # [N, 3] float32 (unit where valid)
    rgb: jax.Array        # [N, 3] float32 (0..255; -1 if unset, point3d.hpp:84)
    pixel: jax.Array      # [N, 2] int32 (row, col); -1 if unset
    class_prob: jax.Array  # [N] float32
    edge_prob: jax.Array   # [N] float32
    valid: jax.Array       # [N] bool

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def from_numpy(
        pos: np.ndarray,
        normal: Optional[np.ndarray] = None,
        rgb: Optional[np.ndarray] = None,
        pixel: Optional[np.ndarray] = None,
        class_prob: Optional[np.ndarray] = None,
        edge_prob: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
    ) -> "PointCloud":
        n = pos.shape[0]
        cap = capacity if capacity is not None else n
        if n > cap:
            raise ValueError(f"{n} points exceed capacity {cap}")

        def pad2(a, fill, dtype, width):
            out = np.full((cap, width), fill, dtype=dtype)
            if a is not None:
                out[:n] = a
            return jnp.asarray(out)

        def pad1(a, fill, dtype):
            out = np.full((cap,), fill, dtype=dtype)
            if a is not None:
                out[:n] = a
            return jnp.asarray(out)

        valid = np.zeros((cap,), dtype=bool)
        valid[:n] = True
        return PointCloud(
            pos=pad2(pos, 0.0, np.float32, 3),
            normal=pad2(normal, 0.0, np.float32, 3),
            rgb=pad2(rgb, -1.0, np.float32, 3),
            pixel=pad2(pixel, -1, np.int32, 2),
            class_prob=pad1(class_prob, 0.0, np.float32),
            edge_prob=pad1(edge_prob, 0.0, np.float32),
            valid=jnp.asarray(valid),
        )

    def to_numpy_trimmed(self) -> dict:
        """Host copy with padding removed (for I/O and tests)."""
        valid = np.asarray(self.valid)
        return {
            "pos": np.asarray(self.pos)[valid],
            "normal": np.asarray(self.normal)[valid],
            "rgb": np.asarray(self.rgb)[valid],
            "pixel": np.asarray(self.pixel)[valid],
            "class_prob": np.asarray(self.class_prob)[valid],
            "edge_prob": np.asarray(self.edge_prob)[valid],
        }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseCandidates:
    """Batched pose hypotheses (reference: PoseCandidate, point3d.hpp:141-156).

    `transform` holds centered-frame model→scene transforms (what scoring
    consumes); `world_transform` the un-centered ones written to disk
    (reference: stocs.cpp:925-933)."""

    transform: jax.Array        # [H, 4, 4] float32
    world_transform: jax.Array  # [H, 4, 4] float32
    lcp: jax.Array              # [H] float32
    base_index: jax.Array       # [H] int32
    valid: jax.Array            # [H] bool

"""model_matching_tpu: TPU-native STOCS 6D pose estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
kuwt/model_matching reference (STOCS, BMVC 2018): probability-weighted
congruent-base sampling, PPF-indexed congruent-set extraction, batched rigid
transform fitting, and weighted-LCP hypothesis scoring — restructured from the
reference's sequential RANSAC loops into fixed-shape batched device programs.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    CameraIntrinsics,
    MatchConfig,
    PreprocessConfig,
    Preset,
    PRESETS,
    get_preset,
)
from .types import PointCloud, PoseCandidates  # noqa: F401

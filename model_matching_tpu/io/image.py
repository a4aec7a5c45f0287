"""Host-side image I/O.

Replaces the reference's cv::imread/imwrite usage (reference:
src/rgbd.cpp:197-199,311, src/stocs.cpp:115-118,625). PNG codec work is pure
host I/O, so we use PIL; all numeric processing downstream is array math.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_rgb(path: str) -> np.ndarray:
    """RGB image as [H, W, 3] uint8 (note: the reference reads BGR via
    OpenCV and unpacks channels explicitly, rgbd.cpp:218-219,271; we keep
    RGB order end-to-end)."""
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def read_u16(path: str) -> np.ndarray:
    """16-bit single-channel image (depth / probability maps) as [H, W] uint16
    (reference: rgbd.cpp:198-199, CV_16UC1)."""
    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.uint16)


def read_u8(path: str) -> np.ndarray:
    """8-bit single-channel image (edge maps, cached masks) as [H, W] uint8
    (reference: stocs.cpp:116, CV_8UC1)."""
    img = Image.open(path).convert("L")
    return np.asarray(img, dtype=np.uint8)


def write_u8(path: str, img: np.ndarray) -> None:
    Image.fromarray(np.asarray(img, dtype=np.uint8), mode="L").save(path)


def write_rgb(path: str, img: np.ndarray) -> None:
    Image.fromarray(np.asarray(img, dtype=np.uint8), mode="RGB").save(path)

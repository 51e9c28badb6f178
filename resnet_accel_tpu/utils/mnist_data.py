"""MNIST IDX file loading (no torchvision download; zero-egress friendly).

Reads the raw idx{1,3}-ubyte files (optionally .gz) that the reference
ships under data/MNIST/raw.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Tuple

import numpy as np


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def load_idx_images(path: str) -> np.ndarray:
    with _open(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != 2051:
            raise ValueError(f"{path}: bad magic {magic} for images")
        data = np.frombuffer(f.read(n * rows * cols), dtype=np.uint8)
    return data.reshape(n, rows, cols)


def load_idx_labels(path: str) -> np.ndarray:
    with _open(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        if magic != 2049:
            raise ValueError(f"{path}: bad magic {magic} for labels")
        return np.frombuffer(f.read(n), dtype=np.uint8).astype(np.int32)


def load_mnist_split(raw_dir: str, split: str = "t10k"
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Load (images uint8 [N,28,28], labels int32 [N]) from an MNIST raw
    dir, accepting either plain or .gz files."""
    imgs = labels = None
    for suffix in ("", ".gz"):
        ip = os.path.join(raw_dir, f"{split}-images-idx3-ubyte{suffix}")
        lp = os.path.join(raw_dir, f"{split}-labels-idx1-ubyte{suffix}")
        if imgs is None and os.path.isfile(ip):
            imgs = load_idx_images(ip)
        if labels is None and os.path.isfile(lp):
            labels = load_idx_labels(lp)
    if imgs is None or labels is None:
        raise FileNotFoundError(f"MNIST {split} files not found in {raw_dir}")
    return imgs, labels

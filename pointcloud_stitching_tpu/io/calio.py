"""Calibration (.cal) file IO — 4x4 extrinsics as whitespace text.

Keeps the reference's on-disk format (reference: registration tool writes a
4x4 text matrix per camera; src/pcs-multicamera-client.cpp loads one .cal per
camera at startup — SURVEY.md §1 L5/L2) so existing calibrations carry over
unchanged.
"""
from __future__ import annotations

import os

import numpy as np


def load_cal(path: str) -> np.ndarray:
    """Load a 4x4 float32 extrinsic matrix from a .cal text file."""
    m = np.loadtxt(path, dtype=np.float64)
    m = np.asarray(m, np.float32).reshape(4, 4)
    return m


def save_cal(path: str, T) -> None:
    T = np.asarray(T, np.float64).reshape(4, 4)
    np.savetxt(path, T, fmt="%.9g")


def load_cals(paths: list[str]) -> np.ndarray:
    """Load N .cal files into a stacked [N, 4, 4] array."""
    return np.stack([load_cal(p) for p in paths])


def discover_cals(directory: str, prefix: str = "") -> list[str]:
    """List .cal files in a directory, sorted by name (camera order)."""
    out = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.endswith(".cal") and f.startswith(prefix))
    return out

"""Frame-weighting strategies for pixel sampling.

TPU-native re-design of ``dataio/data_loader/sampler.py`` (reference:
uniform / fixed-weight / by-ego-speed / from-error-map frame weighting
:25-215, plus the DDP-aware weighted sampler :247 — SURVEY.md §2.5). On TPU
the distributed case is each host drawing from the same distribution with
its own RNG stream (SPMD data sharding).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def frame_weights_uniform(n_frames: int) -> np.ndarray:
    return np.full(n_frames, 1.0 / n_frames)


def frame_weights_by_speed(ego_transforms: np.ndarray, floor: float = 0.1
                           ) -> np.ndarray:
    """Weight frames by ego displacement (faster motion = rarer viewpoints =
    sample more) — reference 'by_speed' mode."""
    t = np.asarray(ego_transforms)[:, :3, 3]
    d = np.linalg.norm(np.diff(t, axis=0), axis=-1)
    d = np.concatenate([d[:1], d])
    w = d + floor * max(d.mean(), 1e-6)
    return w / w.sum()


def frame_weights_from_error_map(error_map: np.ndarray) -> np.ndarray:
    """Per-frame mean error as the sampling weight — reference
    'from_error_map' mode."""
    w = np.asarray(error_map, np.float64).reshape(error_map.shape[0], -1).mean(1)
    w = np.clip(w, 1e-9, None)
    return w / w.sum()


class WeightedFrameSampler:
    def __init__(self, weights: np.ndarray, seed: int = 0):
        self.weights = np.asarray(weights, np.float64)
        self.weights /= self.weights.sum()
        self.rng = np.random.default_rng(seed)

    def sample(self, n: int) -> np.ndarray:
        return self.rng.choice(len(self.weights), size=n, p=self.weights)

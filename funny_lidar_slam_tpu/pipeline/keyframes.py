"""Host-side keyframe store.

Equivalent of the reference's KeyFrame disk persistence
(include/common/keyframe.h:59-94: per-keyframe PCD files under
data/keyframes/) and the in-RAM keyframe vector owned by System
(system.h:166). Columnar NumPy arrays + optional npz persistence make the
store resumable and shardable (SURVEY.md §5.4 'cheap win over the
reference').
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


class KeyFrame:
    """One keyframe. `cloud` (deskewed body-frame points) is LAZY: the hot
    retire loop stores device references (`cloud_dev=(points, mask)`), and
    the ~25-50 ms device->host round trip is paid only when a consumer
    (loop-closure submap, save_map, persistence) first touches `.cloud` —
    off the odometry critical path."""

    def __init__(self, kf_id: int, timestamp: float, pose: np.ndarray,
                 cloud: np.ndarray | None = None, planar=None, corner=None,
                 cloud_dev=None):
        self.kf_id = kf_id
        self.timestamp = timestamp
        self.pose = pose
        self.planar = planar
        self.corner = corner
        self._cloud = cloud
        self._cloud_dev = cloud_dev

    @property
    def cloud(self) -> np.ndarray:
        if self._cloud is None:
            import jax

            pts, msk = jax.device_get(self._cloud_dev)
            self._cloud = np.asarray(pts)[np.asarray(msk)].astype(np.float32)
            self._cloud_dev = None
        return self._cloud

    @cloud.setter
    def cloud(self, v) -> None:
        self._cloud = v
        self._cloud_dev = None


@dataclass
class KeyFrameStore:
    save_dir: str | None = None
    frames: list = field(default_factory=list)

    def add(self, kf: KeyFrame) -> None:
        self.frames.append(kf)
        if self.save_dir:
            os.makedirs(self.save_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(self.save_dir, f"keyframe_{kf.kf_id}.npz"),
                timestamp=kf.timestamp,
                pose=kf.pose,
                cloud=kf.cloud,
                planar=kf.planar if kf.planar is not None else np.zeros((0, 3)),
                corner=kf.corner if kf.corner is not None else np.zeros((0, 3)),
            )

    def __len__(self) -> int:
        return len(self.frames)

    def poses(self) -> np.ndarray:
        return np.stack([f.pose for f in self.frames]) if self.frames else np.zeros((0, 4, 4))

    def set_poses(self, poses: np.ndarray) -> None:
        """Rewrite all keyframe poses after a pose-graph optimization
        (System::PerformLoopclosureOptimization, system.cpp:711-718)."""
        for f, p in zip(self.frames, poses):
            f.pose = np.asarray(p)

    @staticmethod
    def load(save_dir: str) -> "KeyFrameStore":
        store = KeyFrameStore(save_dir=save_dir)
        i = 0
        while True:
            path = os.path.join(save_dir, f"keyframe_{i}.npz")
            if not os.path.exists(path):
                break
            z = np.load(path)
            store.frames.append(
                KeyFrame(
                    kf_id=i,
                    timestamp=float(z["timestamp"]),
                    pose=z["pose"],
                    cloud=z["cloud"],
                    planar=z["planar"] if len(z["planar"]) else None,
                    corner=z["corner"] if len(z["corner"]) else None,
                )
            )
            i += 1
        return store

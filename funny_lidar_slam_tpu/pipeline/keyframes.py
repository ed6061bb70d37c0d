"""Host-side keyframe store.

Equivalent of the reference's KeyFrame disk persistence
(include/common/keyframe.h:59-94: per-keyframe raw/ordered/corner/planar PCD
files under data/keyframes/) and the in-RAM keyframe vector owned by System
(system.h:166). Columnar NumPy arrays + optional npz persistence make the
store resumable and shardable (SURVEY.md §5.4 'cheap win over the
reference').

Laziness contract: the hot retire loop stores DEVICE references
(cloud_dev/feat_dev); each device->host fetch through the tunnel is a
~25-50 ms round trip, so materialization happens in
SlamSystem.retire_batch's off-critical-path sweep (one batched fetch per
retire batch), bounding pinned device memory to <= one batch of keyframes
(round-4 advisor finding: unbounded lazy keyframes pinned ~1.6 MB of HBM
each for the whole run). Touching .cloud/.corner/.planar directly still
works — it just pays the fetch on the spot.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


class KeyFrame:
    """One keyframe. `cloud` (deskewed body-frame points) and the LOAM
    feature clouds `corner`/`planar` are LAZY device references until
    materialized (see module docstring)."""

    def __init__(self, kf_id: int, timestamp: float, pose: np.ndarray,
                 cloud: np.ndarray | None = None, planar=None, corner=None,
                 cloud_dev=None, feat_dev=None):
        self.kf_id = kf_id
        self.timestamp = timestamp
        self.pose = pose
        self._planar = planar
        self._corner = corner
        self._cloud = cloud
        self._cloud_dev = cloud_dev
        # (corner_pts, corner_mask, planar_pts, planar_mask) device arrays
        self._feat_dev = feat_dev

    @property
    def materialized(self) -> bool:
        return self._cloud_dev is None and self._feat_dev is None

    def materialize(self) -> None:
        """Fetch all pending device references (one blocking round trip)."""
        if self.materialized:
            return
        import jax

        refs = {}
        if self._cloud_dev is not None:
            refs["cloud"] = self._cloud_dev
        if self._feat_dev is not None:
            refs["feat"] = self._feat_dev
        got = jax.device_get(refs)
        if "cloud" in got:
            pts, msk = got["cloud"]
            self._cloud = np.asarray(pts)[np.asarray(msk)].astype(np.float32)
        if "feat" in got:
            cp, cm, pp, pm = got["feat"]
            self._corner = np.asarray(cp)[np.asarray(cm)].astype(np.float32)
            self._planar = np.asarray(pp)[np.asarray(pm)].astype(np.float32)
        self._cloud_dev = None
        self._feat_dev = None

    @property
    def cloud(self) -> np.ndarray:
        if self._cloud is None and self._cloud_dev is not None:
            self.materialize()
        return self._cloud

    @cloud.setter
    def cloud(self, v) -> None:
        self._cloud = v
        self._cloud_dev = None

    @property
    def corner(self):
        if self._corner is None and self._feat_dev is not None:
            self.materialize()
        return self._corner

    @corner.setter
    def corner(self, v) -> None:
        self._corner = v

    @property
    def planar(self):
        if self._planar is None and self._feat_dev is not None:
            self.materialize()
        return self._planar

    @planar.setter
    def planar(self, v) -> None:
        self._planar = v


@dataclass
class KeyFrameStore:
    save_dir: str | None = None
    frames: list = field(default_factory=list)

    def add(self, kf: KeyFrame) -> None:
        """Register a keyframe. Persistence happens immediately for already-
        materialized frames; lazy frames are persisted by flush() after the
        batched materialization sweep (SlamSystem.retire_batch)."""
        self.frames.append(kf)
        if self.save_dir and kf.materialized:
            self.flush(kf)

    def flush(self, kf: KeyFrame) -> None:
        """Write one keyframe's npz (materializes it if still lazy)."""
        if not self.save_dir:
            return
        kf.materialize()
        os.makedirs(self.save_dir, exist_ok=True)
        np.savez_compressed(
            os.path.join(self.save_dir, f"keyframe_{kf.kf_id}.npz"),
            timestamp=kf.timestamp,
            pose=kf.pose,
            cloud=kf.cloud,
            planar=kf.planar if kf.planar is not None else np.zeros((0, 3)),
            corner=kf.corner if kf.corner is not None else np.zeros((0, 3)),
        )

    def flush_poses(self) -> None:
        """Persist the CURRENT poses as a sidecar (poses.npy). The per-
        keyframe npz files carry the pose at save time, which goes stale
        when a loop closure rewrites history (system.cpp:711-718) —
        rewriting every npz per loop would cost N cloud writes, so load()
        overrides poses from this cheap sidecar instead."""
        if not self.save_dir or not self.frames:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        np.save(os.path.join(self.save_dir, "poses.npy"), self.poses())

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
        # loop-closure-corrected poses live in the sidecar (flush_poses)
        pose_path = os.path.join(save_dir, "poses.npy")
        if os.path.exists(pose_path):
            poses = np.load(pose_path)
            if len(poses) >= len(store.frames):
                store.set_poses(poses[: len(store.frames)])
        return store

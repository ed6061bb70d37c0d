"""Loose coupling: take the matcher pose directly as the fused state.

(reference: FrontEnd::Run LooseCoupling branch, src/slam/frontend.cpp:226-229 —
pose from registration, velocity carried from the predict, no bias update.)
"""

from __future__ import annotations

import jax

from ..core.state import NavState


def fuse(predict_nav: NavState, lidar_pose: jax.Array) -> NavState:
    return predict_nav.with_pose(lidar_pose.astype(predict_nav.r.dtype))

"""Frontend odometry: the fused per-scan device step.

TPU re-design of FrontEnd::Run (src/slam/frontend.cpp:160-248): instead of a
thread popping clusters from a queue, the whole per-scan flow — deskew ->
IMU preintegration -> predict -> scan-to-map GN -> tight/loose fusion — is a
single jitted program; the host only streams padded scan bundles in and
drains poses out (SURVEY.md §7: no per-iteration host sync).

Fusion methods (constant_variable.h:27-29):
  * TightCouplingOptimization — preintegration predict + 30-dof fusion
    (frontend.cpp:191-193, 250-431)
  * LooseCoupling — IMU delta-rotation predict, matcher pose taken directly
    (frontend.cpp:194-199, 226-229)
  * TightCouplingKF — error-state KF (stubbed LOG(FATAL) in the reference,
    frontend.cpp:200-201; implemented here in fusion/eskf.py)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.cloud import Cloud
from ..core.lie import make_se3, quat_conj, quat_mul, quat_to_mat, se3_inv
from ..core.state import ImuSegment, NavState
from ..fusion import loose
from ..fusion import eskf
from ..fusion.tight import TightFusionConfig, fuse as tight_fuse
from ..imu.preintegration import PreintParams, predict, preintegrate
from ..lidar.deskew import deskew
from ..loam.features import FeatureConfig, extract_features
from ..loam.projection import LidarGeometry, project, synth_rings
from ..ops.voxel import voxel_downsample
from ..registration.matchers import LoamFullMatcher, PointToPlaneMatcher

FUSION_LOOSE = "LooseCoupling"
FUSION_TIGHT_OPT = "TightCouplingOptimization"
FUSION_TIGHT_KF = "TightCouplingKF"


class FrontendState(NamedTuple):
    nav: NavState
    last_pose: jax.Array  # [4, 4] pose of the previous accepted frame
    delta_pose: jax.Array  # [4, 4] last frame-to-frame increment
    initialized: jax.Array  # [] bool


class StepResult(NamedTuple):
    pose: jax.Array  # [4, 4] fused scan pose
    delta_pose: jax.Array
    converged: jax.Array
    num_valid: jax.Array
    iters: jax.Array
    fitness: jax.Array
    # deskewed cloud in the body frame at the scan reference time — what the
    # reference persists per keyframe (KeyFrame::SaveAllCloud saves the
    # PROCESSED clouds, include/common/keyframe.h:59-94), so loop-closure
    # submaps and map products are distortion-free and frame-consistent with
    # the fused pose
    points: jax.Array  # [N, 3]
    mask: jax.Array  # [N]
    # pose/delta/scalars flattened into ONE f32 vector so the host retire
    # drains a frame with a single device->host transfer (each transfer is a
    # multi-ms round trip through the device tunnel): [pose(16), delta(16),
    # converged, num_valid, iters, fitness]
    packed: jax.Array  # [36]
    # LOAM-geometry modes: the extracted feature clouds (body frame), so
    # keyframes can persist corner/planar like the reference
    # (keyframe.h:59-94) and LOAM resume can reseed real feature maps.
    # None when no lidar_geometry is configured.
    corner: Any  # Cloud | None
    planar: Any  # Cloud | None


@dataclass
class FrontendConfig:
    fusion_method: str = FUSION_TIGHT_OPT
    gravity: Any = (0.0, 0.0, -9.81)
    t_lidar_to_imu: Any = None  # [4, 4]
    gyro_noise_std: float = 0.01
    acc_noise_std: float = 0.1
    integration_noise_cov: float = 1.0e-8
    fusion: TightFusionConfig = TightFusionConfig()
    init_info_diag: Any = None
    # LOAM feature processing (preprocessing.cpp:226-237): when geometry is
    # set, scans are projected + feature-extracted before matching
    lidar_geometry: LidarGeometry | None = None
    feature: FeatureConfig = FeatureConfig()
    planar_voxel_filter_size: float = 0.5


def initial_nav_state(segment_quat_last, dtype=jnp.float32) -> NavState:
    """First-frame initialization (FrontEnd::InitOdometer, frontend.cpp:119-158):
    pose from the IMU orientation, prior covariance
    diag(1e-6^2 rot, 1e-2^2 vel, 1e-6^2 pos, (0.1 deg)^2 bg, 0.1^2 ba)."""
    r0 = quat_to_mat(segment_quat_last.astype(dtype))
    return _nav_with_init_prior(r0, jnp.zeros(3, dtype), dtype)


def _nav_with_init_prior(r0, p0, dtype=jnp.float32) -> NavState:
    cov = jnp.zeros((15, 15), dtype)
    cov = cov.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype) * 1e-12)
    cov = cov.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype) * 1e-4)
    cov = cov.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype) * 1e-12)
    cov = cov.at[9:12, 9:12].set(jnp.eye(3, dtype=dtype) * (0.1 * jnp.pi / 180.0) ** 2)
    cov = cov.at[12:15, 12:15].set(jnp.eye(3, dtype=dtype) * 0.01)
    info = jnp.linalg.inv(cov + 1e-18 * jnp.eye(15, dtype=dtype))
    nav = NavState.identity(dtype)._replace(r=r0, p=p0, info=info)
    return nav


class Frontend:
    """Builds the jitted per-scan step around a matcher instance.

    The matcher is any of the five registration.matchers classes; its state
    pytree is threaded through unchanged.
    """

    def __init__(self, matcher, cfg: FrontendConfig, dtype=jnp.float32):
        self.matcher = matcher
        self.cfg = cfg
        self.dtype = dtype
        self.params = PreintParams.from_std(
            cfg.gyro_noise_std, cfg.acc_noise_std, cfg.integration_noise_cov, dtype
        )
        self.eskf_params = eskf.EskfParams.from_std(
            cfg.gyro_noise_std, cfg.acc_noise_std,
            cfg.fusion.gyro_rw_std, cfg.fusion.acc_rw_std, dtype,
        )
        self.t_l2i = (
            jnp.eye(4, dtype=dtype)
            if cfg.t_lidar_to_imu is None
            else jnp.asarray(cfg.t_lidar_to_imu, dtype)
        )
        # aot_jit = jax.jit + disk-backed executable cache: this platform's
        # PJRT plugin has no persistent compile cache, and a cold compile of
        # the fused step runs minutes through the device tunnel
        from ..utils.aot_cache import aot_jit

        self._step = aot_jit(self._step_impl)
        self._init_step = aot_jit(self._init_impl)
        self._init_at_step = aot_jit(self._init_at_impl)

    # -- first frame: init odometer + seed map (frontend.cpp:177-183) --
    def _init_impl(self, mstate, points, rel_times, mask, ref_time, segment: ImuSegment, ring):
        n_seg = jnp.sum(segment.mask, dtype=jnp.int32)
        q_last = segment.quat[jnp.maximum(n_seg - 1, 0)]
        nav = initial_nav_state(q_last, self.dtype)
        return self._init_from_nav(mstate, nav, points, rel_times, mask,
                                   ref_time, segment, ring)

    def _init_at_impl(self, mstate, pose, vel, points, rel_times, mask,
                      ref_time, segment: ImuSegment, ring):
        """Init at a GIVEN pose (mapping resume: continue from the last
        keyframe's pose instead of the IMU orientation; biases restart at
        zero with the first-frame prior; `vel` carries the finite-difference
        velocity of the last two persisted keyframes so a mid-motion resume
        does not start from a standstill assumption)."""
        nav = initial_nav_state(segment.quat[0], self.dtype)
        nav = nav._replace(r=pose[:3, :3].astype(self.dtype),
                           p=pose[:3, 3].astype(self.dtype),
                           v=vel.astype(self.dtype))
        # unlike the standstill first-frame init, a resumed run is in
        # motion: the keyframe finite difference is good to ~keyframe_dist *
        # rotation-rate, so std 0.01 -> 0.5 m/s
        info = nav.info.at[3:6, 3:6].set(
            jnp.eye(3, dtype=self.dtype) / 0.5**2)
        nav = nav._replace(info=info)
        return self._init_from_nav(mstate, nav, points, rel_times, mask,
                                   ref_time, segment, ring)

    def _init_from_nav(self, mstate, nav, points, rel_times, mask, ref_time,
                       segment: ImuSegment, ring):
        if self.cfg.fusion_method == FUSION_TIGHT_KF:
            # in KF mode the info slot stores the error COVARIANCE
            nav = nav._replace(info=eskf.create(nav).cov)
        pts, msk = deskew(points, rel_times, mask, ref_time, segment, self.t_l2i)
        cloud = Cloud(pts, msk)
        mstate = self._matcher_add_first(mstate, cloud, nav.pose, ring, rel_times)
        fstate = FrontendState(
            nav=nav._replace(t=ref_time.astype(self.dtype)),
            last_pose=nav.pose,
            delta_pose=jnp.eye(4, dtype=self.dtype),
            initialized=jnp.asarray(True),
        )
        return mstate, fstate, (pts, msk)

    def _process(self, cloud: Cloud, ring, rel_times):
        """Feature extraction branch (preprocessing.cpp:226-237): project the
        deskewed cloud and split into corner/planar clouds. The planar cloud
        is voxel-filtered like the reference's planar_voxel_filter."""
        cfg = self.cfg
        scan = project(cloud.points, ring, rel_times, cloud.mask, cfg.lidar_geometry)
        corner, planar = extract_features(scan, cfg.feature)
        planar = voxel_downsample(
            planar.points, planar.mask, cfg.planar_voxel_filter_size,
            cfg.feature.planar_capacity,
        )
        return Cloud(planar.points, planar.mask), corner

    def _matcher_add_first(self, mstate, cloud: Cloud, pose, ring=None, rel_times=None):
        if self.cfg.lidar_geometry is not None:
            planar, corner = self._process(cloud, ring, rel_times)
            if isinstance(self.matcher, LoamFullMatcher):
                return self.matcher.add_first(mstate, corner, planar, pose)
            return self.matcher.add_first(mstate, planar, pose)
        return self.matcher.add_first(mstate, cloud, pose)

    def _matcher_match(self, mstate, cloud: Cloud, pose, ring=None, rel_times=None):
        """Returns (mstate, GNResult, feats) where feats is the
        (corner, planar) Cloud pair in LOAM-geometry modes (persisted per
        keyframe like the reference, keyframe.h:59-94) or None."""
        if self.cfg.lidar_geometry is not None:
            planar, corner = self._process(cloud, ring, rel_times)
            if isinstance(self.matcher, LoamFullMatcher):
                ms, res = self.matcher.match(mstate, corner, planar, pose)
            else:
                ms, res = self.matcher.match(mstate, planar, pose)
            return ms, res, (corner, planar)
        ms, res = self.matcher.match(mstate, cloud, pose)
        return ms, res, None

    def _step_impl(
        self,
        mstate,
        fstate: FrontendState,
        points,
        rel_times,
        mask,
        ref_time,
        deskew_segment: ImuSegment,
        preint_segment: ImuSegment,
        ring,
    ):
        cfg = self.cfg
        dtype = self.dtype
        gravity = jnp.asarray(cfg.gravity, dtype)
        nav = fstate.nav

        pts, msk = deskew(points, rel_times, mask, ref_time, deskew_segment, self.t_l2i)
        cloud = Cloud(pts, msk)

        if cfg.fusion_method != FUSION_TIGHT_KF:
            pre = preintegrate(preint_segment, self.params, nav.bg, nav.ba)

        if cfg.fusion_method == FUSION_TIGHT_OPT:
            pred = predict(pre, nav, gravity)
        elif cfg.fusion_method == FUSION_TIGHT_KF:
            es = eskf.EskfState(nav=nav, cov=nav.info)
            es = eskf.predict(es, preint_segment, self.eskf_params, gravity)
            pred = es.nav
        elif cfg.fusion_method == FUSION_LOOSE:
            # loose predict: chain delta pose; rotation from the IMU
            # orientation increment (frontend.cpp:194-199)
            n_seg = jnp.sum(preint_segment.mask, dtype=jnp.int32)
            q_first = preint_segment.quat[0].astype(dtype)
            q_last = preint_segment.quat[jnp.maximum(n_seg - 1, 0)].astype(dtype)
            dq = quat_mul(quat_conj(q_first), q_last)
            pose_pred = nav.pose @ fstate.delta_pose
            r_pred = nav.r @ quat_to_mat(dq)
            pred = nav._replace(r=r_pred, p=pose_pred[:3, 3])
        else:
            raise NotImplementedError(cfg.fusion_method)

        mstate, res, feats = self._matcher_match(mstate, cloud, pred.pose, ring, rel_times)

        if cfg.fusion_method == FUSION_TIGHT_OPT:
            fused = tight_fuse(nav, pre, res.t_mat, pred._replace(t=ref_time.astype(dtype)),
                               gravity, cfg.fusion)
        elif cfg.fusion_method == FUSION_TIGHT_KF:
            es2 = eskf.update_pose(
                es, res.t_mat, cfg.fusion.lidar_rotation_std, cfg.fusion.lidar_position_std
            )
            fused = es2.nav._replace(info=es2.cov, t=ref_time.astype(dtype))
        else:
            fused = loose.fuse(pred._replace(t=ref_time.astype(dtype)), res.t_mat)

        # scan dropped when registration fails (frontend.cpp:208-210)
        new_nav = jax.tree.map(lambda a, b: jnp.where(res.converged, a, b), fused, nav)
        curr_pose = new_nav.pose
        delta = jnp.where(res.converged, se3_inv(fstate.last_pose) @ curr_pose, fstate.delta_pose)
        last_pose = jnp.where(res.converged, curr_pose, fstate.last_pose)

        new_fstate = FrontendState(
            nav=new_nav,
            last_pose=last_pose,
            delta_pose=delta,
            initialized=fstate.initialized,
        )
        packed = jnp.concatenate([
            curr_pose.reshape(-1).astype(jnp.float32),
            delta.reshape(-1).astype(jnp.float32),
            jnp.stack([
                res.converged.astype(jnp.float32),
                res.num_valid.astype(jnp.float32),
                res.iters.astype(jnp.float32),
                res.total_res.astype(jnp.float32),
            ]),
        ])
        out = StepResult(
            pose=curr_pose,
            delta_pose=delta,
            converged=res.converged,
            num_valid=res.num_valid,
            iters=res.iters,
            fitness=res.total_res,
            points=pts,
            mask=msk,
            packed=packed,
            corner=feats[0] if feats else None,
            planar=feats[1] if feats else None,
        )
        return mstate, new_fstate, out

    # ------------------------------------------------------------------
    def _default_ring(self, points):
        if self.cfg.lidar_geometry is None:
            return jnp.zeros(points.shape[0], jnp.int32)
        return synth_rings(points, self.cfg.lidar_geometry.n_rows)

    def init_from_pose(self, pose, ref_time) -> FrontendState:
        """Localization-mode initialization (Localization::Init,
        localization.cpp:114-169): the nav state starts at the fitness-gated
        matched pose with the standard first-frame prior; the frozen map is
        NOT touched."""
        pose = jnp.asarray(pose, self.dtype)
        nav = _nav_with_init_prior(pose[:3, :3], pose[:3, 3], self.dtype)
        if self.cfg.fusion_method == FUSION_TIGHT_KF:
            nav = nav._replace(info=eskf.create(nav).cov)
        return FrontendState(
            nav=nav._replace(t=jnp.asarray(ref_time, self.dtype)),
            last_pose=nav.pose,
            delta_pose=jnp.eye(4, dtype=self.dtype),
            initialized=jnp.asarray(True),
        )

    def init_frame(self, mstate, scan_points, rel_times, mask, ref_time, segment, ring=None):
        ring = self._default_ring(scan_points) if ring is None else ring
        return self._init_step(
            mstate, scan_points, rel_times, mask, jnp.asarray(ref_time, self.dtype),
            segment, ring,
        )

    def init_frame_at(self, mstate, pose, scan_points, rel_times, mask,
                      ref_time, segment, ring=None, velocity=None):
        """Init at a given world pose (mapping resume)."""
        ring = self._default_ring(scan_points) if ring is None else ring
        vel = (jnp.zeros(3, self.dtype) if velocity is None
               else jnp.asarray(velocity, self.dtype))
        return self._init_at_step(
            mstate, jnp.asarray(pose, self.dtype), vel, scan_points,
            rel_times, mask, jnp.asarray(ref_time, self.dtype), segment, ring,
        )

    def step(self, mstate, fstate, scan_points, rel_times, mask, ref_time, deskew_seg,
             preint_seg, ring=None):
        ring = self._default_ring(scan_points) if ring is None else ring
        return self._step(
            mstate, fstate, scan_points, rel_times, mask,
            jnp.asarray(ref_time, self.dtype), deskew_seg, preint_seg, ring,
        )

    # -- packed single-transfer feed path --------------------------------
    # Each host->device transfer through the device tunnel is a multi-ms
    # round trip, and the unpacked step needs ~14 of them per scan (scan
    # points / rel-times / mask / ref-time / 2 IMU segments x 5 arrays).
    # The live loop was host-transfer-bound at ~98 ms/frame against a
    # ~29 ms device step (round-4 profile), so the scan bundle is packed
    # into ONE f32 buffer on the host and unpacked with static slices on
    # device — the feed-side mirror of StepResult.packed.

    def packed_layout(self, scan_capacity: int, seg_capacity: int):
        """(total_size, offsets) of the packed frame buffer."""
        cap, s = scan_capacity, seg_capacity
        sizes = {
            "pts": cap * 3, "rts": cap, "mask": cap, "ref": 1,
            "d_t": s, "d_gyro": s * 3, "d_accel": s * 3, "d_quat": s * 4,
            "d_mask": s,
            "p_t": s, "p_gyro": s * 3, "p_accel": s * 3, "p_quat": s * 4,
            "p_mask": s,
        }
        offs, o = {}, 0
        for k, v in sizes.items():
            offs[k] = (o, o + v)
            o += v
        return o, offs

    def pack_frame(self, points, rel_times, scan_capacity, ref_time,
                   deskew_seg: ImuSegment, preint_seg: ImuSegment):
        """Host-side (NumPy) assembly of the single-transfer frame buffer."""
        import numpy as np

        s = len(deskew_seg.t)
        total, offs = self.packed_layout(scan_capacity, s)
        buf = np.zeros(total, np.float32)

        n = min(len(points), scan_capacity)
        o = offs["pts"][0]
        buf[o:o + n * 3] = np.asarray(points[:n], np.float32).reshape(-1)
        buf[offs["rts"][0]:offs["rts"][0] + n] = rel_times[:n]
        buf[offs["mask"][0]:offs["mask"][0] + n] = 1.0
        buf[offs["ref"][0]] = ref_time
        for pre, seg in (("d", deskew_seg), ("p", preint_seg)):
            for name, arr in (("t", seg.t), ("gyro", seg.gyro),
                              ("accel", seg.accel), ("quat", seg.quat),
                              ("mask", seg.mask)):
                a, b = offs[f"{pre}_{name}"]
                buf[a:b] = np.asarray(arr, np.float32).reshape(-1)
        return buf

    def _unpack(self, buf, scan_capacity: int, seg_capacity: int):
        cap, s = scan_capacity, seg_capacity
        _, offs = self.packed_layout(cap, s)

        def sl(k, shape=None):
            a, b = offs[k]
            v = buf[a:b]
            return v.reshape(shape) if shape else v

        def seg(pre):
            return ImuSegment(
                t=sl(f"{pre}_t"),
                gyro=sl(f"{pre}_gyro", (s, 3)),
                accel=sl(f"{pre}_accel", (s, 3)),
                quat=sl(f"{pre}_quat", (s, 4)),
                mask=sl(f"{pre}_mask") > 0.5,
            )

        pts = sl("pts", (cap, 3))
        return (pts, sl("rts"), sl("mask") > 0.5, buf[offs["ref"][0]],
                seg("d"), seg("p"))

    def _step_packed_impl(self, mstate, fstate, buf, scan_capacity,
                          seg_capacity):
        pts, rts, mask, ref, dseg, pseg = self._unpack(
            buf, scan_capacity, seg_capacity)
        ring = self._default_ring(pts)
        # rel_times arrive already shifted to the reference frame by the
        # caller (system.dispatch_scan packs absolute-ref-relative times),
        # so the step consumes them as-is
        return self._step_impl(mstate, fstate, pts, rts, mask, ref, dseg,
                               pseg, ring)

    def step_packed(self, mstate, fstate, buf_np, scan_capacity, seg_capacity):
        if not hasattr(self, "_step_packed"):
            from ..utils.aot_cache import aot_jit

            self._step_packed = aot_jit(
                self._step_packed_impl,
                static_argnames=("scan_capacity", "seg_capacity"),
            )
        # statics as kwargs: aot_jit bakes them into the cached executable
        return self._step_packed(mstate, fstate, jnp.asarray(buf_np),
                                 scan_capacity=scan_capacity,
                                 seg_capacity=seg_capacity)

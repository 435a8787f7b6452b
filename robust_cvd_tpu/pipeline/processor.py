"""DepthVideoProcessor equivalent: the op dispatcher over a VideoStore.

API-parity facade for the reference's processor (lib/Processor.{h,cpp}:
ops Copy, BilateralFilter, FlowGuidedFilter, ClipMaxDepth,
ComputeConstraints, ComputeTracks, GridXformSplit, ResetPoses,
ResetDepthXforms, ResetSpatialXforms, NormalizeDepth, OptimizePoses,
ResetNormalizeOptimize). Each op maps onto the tensorized subsystems.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..camera import quat_to_matrix
from ..config import PoseOptParams
from ..io.store import VideoStore
from ..ops import filters, geometry
from ..solver import pose_opt, tracks, xforms
from ..solver.residuals import SolverParams
from ..solver.xforms import GridSpec


class Op(Enum):
    NONE = "none"
    COPY = "copy"
    BILATERAL_FILTER = "bilateral_filter"
    FLOW_GUIDED_FILTER = "flow_guided_filter"
    CLIP_MAX_DEPTH = "clip_max_depth"
    COMPUTE_CONSTRAINTS = "compute_constraints"
    COMPUTE_TRACKS = "compute_tracks"
    GRID_XFORM_SPLIT = "grid_xform_split"
    RESET_POSES = "reset_poses"
    RESET_DEPTH_XFORMS = "reset_depth_xforms"
    RESET_SPATIAL_XFORMS = "reset_spatial_xforms"
    NORMALIZE_DEPTH = "normalize_depth"
    OPTIMIZE_POSES = "optimize_poses"
    RESET_NORMALIZE_OPTIMIZE = "reset_normalize_optimize"


@dataclasses.dataclass
class ProcessorParams:
    """(reference lib/Processor.h:60-90)."""

    op: Op = Op.NONE
    depth_stream: str = ""
    source_depth_stream: str = ""
    spatial_radius: int = 0
    frame_radius: int = 2
    depth_sigma: float = 0.3
    color_sigma: float = 0.0
    median: bool = False
    max_depth: float = 1000.0
    match_separation: int = 10
    track_spawn_distance: int = 20
    track_prune_distance: int = 5
    min_dynamic_distance: int = 3
    min_track_length: int = 4
    pose_optimizer: PoseOptParams = dataclasses.field(default_factory=PoseOptParams)


class Processor:
    def __init__(self, store: VideoStore):
        self.store = store
        self.solver_params: Optional[SolverParams] = None

    # -- dispatch ------------------------------------------------------------

    def process(self, p: ProcessorParams):
        handler = {
            Op.COPY: self.copy,
            Op.BILATERAL_FILTER: self.bilateral_filter,
            Op.FLOW_GUIDED_FILTER: self.flow_guided_filter,
            Op.CLIP_MAX_DEPTH: self.clip_max_depth,
            Op.COMPUTE_TRACKS: self.compute_tracks,
            Op.RESET_POSES: self.reset_poses,
        }.get(p.op)
        if handler is None:
            raise ValueError(f"unsupported op {p.op}")
        return handler(p)

    # -- ops -----------------------------------------------------------------

    def copy(self, p: ProcessorParams):
        """(reference Processor.cpp:152-181)."""
        self.store.duplicate_depth_stream(p.source_depth_stream, p.depth_stream)

    def bilateral_filter(self, p: ProcessorParams):
        depth = jnp.asarray(self.store.load_depth_stream(p.source_depth_stream))
        color = jnp.asarray(self.store.load_color_down()) if p.color_sigma > 0 else None
        out = filters.bilateral_filter(
            depth, p.spatial_radius, p.frame_radius, p.depth_sigma,
            color, p.color_sigma, p.median,
        )
        self.store.save_depth_stream(p.depth_stream, np.asarray(out))

    def flow_guided_filter(self, p: ProcessorParams):
        """(reference Processor.cpp:315-590 + pose_optimization.py:292-326)."""
        store = self.store
        depth = jnp.asarray(store.load_depth_stream(p.source_depth_stream))
        N, H, W = depth.shape
        cams = self._filter_cameras((H, W))
        ext = self._extrinsics()
        pts_cam = geometry.depth_to_points(depth, cams.intrinsics)
        world = geometry.points_cam_to_world(pts_cam, ext[:, None, None])

        flows_fwd = np.zeros((N, H, W, 2), np.float32)
        masks_fwd = np.zeros((N, H, W), bool)
        flows_bwd = np.zeros((N, H, W, 2), np.float32)
        masks_bwd = np.zeros((N, H, W), bool)
        for i in range(N - 1):
            try:
                flows_fwd[i] = store.load_flow(i, i + 1)
                masks_fwd[i] = store.load_flow_mask(i, i + 1)
                flows_bwd[i + 1] = store.load_flow(i + 1, i)
                masks_bwd[i + 1] = store.load_flow_mask(i + 1, i)
            except FileNotFoundError:
                continue

        out = filters.flow_guided_filter(
            depth, world, cams,
            jnp.asarray(flows_fwd), jnp.asarray(masks_fwd),
            jnp.asarray(flows_bwd), jnp.asarray(masks_bwd),
            frame_radius=p.frame_radius, median=p.median,
        )
        self.store.save_depth_stream(p.depth_stream, np.asarray(out))

    def clip_max_depth(self, p: ProcessorParams):
        depth = jnp.asarray(self.store.load_depth_stream(p.source_depth_stream or p.depth_stream))
        self.store.save_depth_stream(
            p.depth_stream, np.asarray(filters.clip_max_depth(depth, p.max_depth))
        )

    def compute_tracks(self, p: ProcessorParams) -> tracks.TrackTable:
        from ..solver import constraints as C

        store = self.store
        down = store.load_color_down()
        gray = C.rgb_to_gray(down)
        corner = np.asarray(C.corner_min_eigenval(jnp.asarray(gray)))
        N = store.num_frames
        flows_fwd, masks_fwd = {}, {}
        for i in range(N - 1):
            try:
                flows_fwd[i] = store.load_flow(i, i + 1)
                masks_fwd[i] = store.load_flow_mask(i, i + 1)
            except FileNotFoundError:
                continue
        dyn = store.load_dynamic_mask()
        dyn_dist = None
        if dyn is not None:
            dyn_dist = np.stack([C.dynamic_distance(m, m.shape) for m in dyn])
        return tracks.compute_tracks(
            corner, flows_fwd, masks_fwd, store.inv_aspect, dyn_dist,
            p.track_spawn_distance, p.track_prune_distance,
            p.min_dynamic_distance, p.min_track_length,
        )

    def reset_poses(self, p: ProcessorParams):
        """(reference Processor.cpp:987-1003)."""
        from ..camera import CameraState

        self.store.camera = CameraState.default(
            self.store.num_frames, self.store.aspect, p.pose_optimizer.focal_long
        )

    def grid_xform_split(self, grid: jnp.ndarray, new_spec: GridSpec):
        """(reference Processor.cpp:888-985) — exposed for solver use."""
        return xforms.split_grid(grid, new_spec)

    # -- helpers -------------------------------------------------------------

    def _extrinsics(self):
        cam = self.store.camera
        if cam is None:
            from ..camera import CameraState

            cam = CameraState.default(self.store.num_frames, self.store.aspect)
        R = jax.vmap(quat_to_matrix)(cam.quaternion)
        return jnp.concatenate([R, cam.position[:, :, None]], axis=2)

    def _filter_cameras(self, shape):
        cam = self.store.camera
        if cam is None:
            from ..camera import CameraState

            cam = CameraState.default(self.store.num_frames, self.store.aspect)
        R = jax.vmap(quat_to_matrix)(cam.quaternion)
        forward = -R[:, :, 2]  # camera looks down -Z: forward = R @ (0,0,-1)
        intr = geometry.intrinsics_px(cam.vfov, cam.hfov, shape)
        return filters.FilterCameras(
            position=cam.position, forward=forward, intrinsics=intr
        )

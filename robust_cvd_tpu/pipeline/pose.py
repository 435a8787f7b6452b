"""Pose-optimization stage: store -> constraints -> solver -> camera/depth.

Python-side equivalent of reference pose_optimization.py:98-326 (which binds
the C++ DepthVideo + FlowConstraintsCollection + DepthVideoPoseOptimizer):
builds flow constraints from the result folder, runs the TPU LM solver, and
exposes per-frame geometry for the fine-tuner.
"""

from __future__ import annotations

import os
from os.path import join as pjoin
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import PipelineConfig
from ..io.store import VideoStore
from ..solver import constraints as C
from ..solver import pose_opt
from ..solver.pose_opt import PoseOptInputs
from ..solver.residuals import ConstraintData, SolverParams, TripletData


class PoseOptimizer:
    """(reference pose_optimization.py PoseOptimizer)."""

    def __init__(self, cfg: PipelineConfig, store: VideoStore, depth_stream: str):
        self.cfg = cfg
        self.store = store
        self.depth_stream = depth_stream
        self.solver_params: Optional[SolverParams] = None
        self._build_constraints()

    # -- constraint construction (reference lib/FlowConstraints.cpp) --------

    def _build_constraints(self):
        store = self.store
        flow_list = store.load_flow_list()
        pair_keys = sorted({(i, j) for (i, j, _) in flow_list})
        n = store.num_frames
        triplet_keys = [
            t
            for t in range(1, n - 1)
            if self._has_flow(t, t - 1) and self._has_flow(t, t + 1)
        ]

        down = store.load_color_down()
        gray = C.rgb_to_gray(down)
        corner = np.asarray(C.corner_min_eigenval(jnp.asarray(gray)))

        inv_aspect = store.inv_aspect
        pairs: Dict[Tuple[int, int], C.PairConstraints] = {}
        for (i, j) in pair_keys:
            pairs[(i, j)] = C.build_pair_constraints(
                corner[i],
                store.load_flow(i, j),
                store.load_flow_mask(i, j),
                inv_aspect,
            )
        triplets: Dict[int, C.TripletConstraints] = {}
        for t in triplet_keys:
            triplets[t] = C.build_triplet_constraints(
                corner[t],
                store.load_flow(t, t - 1),
                store.load_flow_mask(t, t - 1),
                store.load_flow(t, t + 1),
                store.load_flow_mask(t, t + 1),
                inv_aspect,
            )

        # static flags (reference pose_optimization.py:170-175)
        if self.cfg.opt.dynamic_constraints == "Mask":
            dyn = store.load_dynamic_mask()
            dyn_dist = (
                np.stack([C.dynamic_distance(m, m.shape) for m in dyn])
                if dyn is not None
                else None
            )
            C.set_static_flags(
                pair_keys, pairs, triplet_keys, triplets, dyn_dist,
                min_dynamic_distance=8.0,
            )
        elif self.cfg.opt.dynamic_constraints == "Ransac":
            from ..ops.epipolar import set_static_flags_from_ransac

            h, w = down.shape[1:3]
            set_static_flags_from_ransac(
                pair_keys, pairs, (h, w), inv_aspect,
                self.cfg.opt.epipolar_dist_thresh,
            )
        # "None" leaves everything static.

        self.pair_keys = pair_keys
        self.pairs = pairs
        self.triplet_keys = triplet_keys
        self.triplets = triplets

    def _has_flow(self, i, j):
        return os.path.exists(
            pjoin(self.store.base_dir, "flow", f"flow_{i:06d}_{j:06d}.raw")
        )

    def _make_inputs(self) -> PoseOptInputs:
        depth = self.store.load_depth_stream(self.depth_stream)
        data = C.flatten_pairs(
            self.pair_keys, self.pairs, depth, self.store.inv_aspect
        )
        opt = self.cfg.opt
        triplets = None
        if opt.smooth_static_weight > 0 or opt.smooth_dynamic_weight > 0:
            triplets = C.flatten_triplets(
                self.triplet_keys,
                self.triplets,
                depth,
                self.store.inv_aspect,
                opt.smooth_static_weight,
                opt.smooth_dynamic_weight,
            )
        median = jnp.asarray(
            np.median(depth.reshape(depth.shape[0], -1), axis=1).astype(np.float32)
        )
        dyn = None
        if self.cfg.opt.adaptive_deformation_cost > 0:
            dyn = self.store.load_dynamic_mask()
        return PoseOptInputs(
            data=data,
            median_depth=median,
            aspect=self.store.aspect,
            num_frames=self.store.num_frames,
            triplets=triplets,
            dynamic_mask=dyn,
        )

    # -- optimization (reference pose_optimization.py:177-240) ---------------

    def optimize_poses(self) -> SolverParams:
        inputs = self._make_inputs()
        self.solver_params = pose_opt.run(
            self.cfg.opt, inputs, initial=self.solver_params
        )
        self.last_inputs = inputs
        return self.solver_params

    def save(self):
        """Persist optimized camera state + transforms back to the store and
        write `video.dat` (reference pose_optimization.py:240 calls
        depth_video.save())."""
        from ..camera import pose_params_to_camera

        if self.solver_params is None:
            return
        self.store.camera = pose_params_to_camera(
            self.solver_params.pose, self.solver_params.focal, self.store.aspect
        )
        self.write_video_dat()

    def write_video_dat(self):
        """Serialize the clip state in the reference's binary container
        (reference lib/DepthVideo.cpp:300-385)."""
        import numpy as np

        from ..io import video_dat as vd

        store = self.store
        sp = self.solver_params
        cam = store.camera
        N = store.num_frames

        gz, gy, gx = sp.depth_grid.shape[1:]
        if (gx, gy, gz) == (1, 1, 1):
            ddesc = vd.XformDesc(type="Depth", depth_type="Global", value_xform="Scale")
        else:
            ddesc = vd.XformDesc(
                type="Depth", depth_type="Grid", value_xform="Scale",
                grid_size=(gx, gy, gz),
            )
        sy, sx = sp.spatial_grid.shape[1:3]
        if (sx, sy) == (1, 1):
            sdesc = vd.XformDesc(type="Spatial", spatial_type="Identity")
        else:
            sdesc = vd.XformDesc(
                type="Spatial", spatial_type="BicubicGrid", grid_size=(sx, sy, 0)
            )

        down = store.load_color_down()
        dh, dw = down.shape[1:3]
        frames = []
        for i in range(N):
            frames.append(
                vd.DepthFrameInfo(
                    vfov=float(cam.vfov[i]),
                    hfov=float(cam.hfov[i]),
                    position=tuple(np.asarray(cam.position[i], float)),
                    quaternion=tuple(np.asarray(cam.quaternion[i], float)),
                    enabled=True,
                    depth_params=np.asarray(sp.depth_grid[i], np.float64).reshape(-1),
                    spatial_params=(
                        np.asarray(sp.spatial_grid[i], np.float64).reshape(-1)
                        if (sx, sy) != (1, 1)
                        else np.zeros(0)
                    ),
                )
            )
        container = vd.VideoDat(
            pts=list(store.meta.pts),
            color_streams=[
                vd.ColorStreamInfo("full", "color_full", ".png", 21, store.meta.width, store.meta.height),
                vd.ColorStreamInfo("down", "color_down", ".raw", 21, dw, dh),
            ],
            depth_streams=[
                vd.DepthStreamInfo(
                    self.depth_stream, self.depth_stream, ddesc, sdesc, dw, dh, frames
                )
            ],
            duration=store.meta.pts[-1] if store.meta.pts else 0.0,
            width=store.meta.width,
            height=store.meta.height,
        )
        vd.save_video_dat(pjoin(store.base_dir, "video.dat"), container)

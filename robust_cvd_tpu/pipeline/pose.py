"""Pose-optimization stage: store -> constraints -> solver -> camera/depth.

Python-side equivalent of reference pose_optimization.py:98-326 (which binds
the C++ DepthVideo + FlowConstraintsCollection + DepthVideoPoseOptimizer):
builds flow constraints from the result folder, runs the TPU LM solver, and
exposes per-frame geometry for the fine-tuner.
"""

from __future__ import annotations

import os
from os.path import join as pjoin
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import PipelineConfig
from ..io.store import VideoStore
from ..solver import constraints as C
from ..solver import pose_opt
from ..solver.pose_opt import PoseOptInputs
from ..solver.residuals import ConstraintData, SolverParams, TripletData


class DepthStreamRef(NamedTuple):
    """One registered depth stream: a name + an absolute directory holding
    `depth/frame_%06d.raw` disparity files (reference DepthVideo's stream
    list, lib/DepthVideo.cpp:409-580)."""

    name: str
    dir: str


class PoseOptimizer:
    """(reference pose_optimization.py PoseOptimizer)."""

    def __init__(self, cfg: PipelineConfig, store: VideoStore, depth_stream: str):
        self.cfg = cfg
        self.store = store
        self.depth_stream = depth_stream
        self.solver_params: Optional[SolverParams] = None
        self.initial_camera = None  # imported GT/COLMAP poses, if any
        self.enabled_frames = None
        # stream 0 lives at <base>/<name>/depth (reference Importer layout)
        self.streams: List[DepthStreamRef] = []
        self._import_external_streams()
        self.streams.append(
            DepthStreamRef(depth_stream, pjoin(store.base_dir, depth_stream))
        )
        self._build_constraints()

    def _import_external_streams(self):
        """Register GT depth/pose and COLMAP reconstruction streams before
        the estimated stream (reference pose_optimization.py:119-159: the
        LAST stream is the optimized one; earlier streams carry imported
        geometry, and COLMAP poses seed the estimated stream)."""
        from ..io import importers

        base = self.store.base_dir
        store = self.store

        gt_dir = pjoin(base, "depth_gt")
        if os.path.isdir(gt_dir):
            self.streams.append(DepthStreamRef("depth_gt", gt_dir))
            poses_file = pjoin(gt_dir, "poses.txt")
            if os.path.exists(poses_file):
                cam, enabled = importers.import_poses(
                    poses_file, store.num_frames
                )
                self.initial_camera = cam
                self.enabled_frames = enabled

        colmap_meta = pjoin(base, "colmap_dense", "metadata.npz")
        colmap_depth = pjoin(base, "depth_colmap_dense")
        if os.path.exists(colmap_meta) and os.path.isdir(colmap_depth):
            imported = pjoin(base, "depth_colmap_dense_imported")
            if not os.path.isdir(pjoin(imported, "depth")):
                importers.import_colmap_depth(
                    pjoin(colmap_depth, "depth")
                    if os.path.isdir(pjoin(colmap_depth, "depth"))
                    else colmap_depth,
                    pjoin(imported, "depth"),
                    base,
                )
            self.streams.append(DepthStreamRef("colmap_dense", imported))
            cam, enabled = importers.import_colmap_recon(
                base, colmap_meta,
                pjoin(imported, "depth"),
                store.num_frames,
            )
            # COLMAP poses seed the estimated stream
            # (reference pose_optimization.py:152-158 copy_poses)
            self.initial_camera = cam
            self.enabled_frames = enabled

    # -- depth-stream registry (reference pose_optimization.py:242-326) -----

    def _load_stream_depth(self, ref: DepthStreamRef) -> np.ndarray:
        from ..io import raw

        frames = [
            raw.disparity_to_depth(
                raw.load_raw_float32_image(
                    pjoin(ref.dir, "depth", f"frame_{i:06d}.raw")
                )
            )
            for i in range(self.store.num_frames)
        ]
        return np.stack(frames)

    def save_depth_to_last_stream(self, depth: np.ndarray) -> None:
        """Write (N, h, w) depth as disparity .raw into the newest stream
        (the reference's save_depth into self.depth_dir)."""
        from ..io import raw

        ref = self.streams[-1]
        d = pjoin(ref.dir, "depth")
        os.makedirs(d, exist_ok=True)
        for i in range(self.store.num_frames):
            raw.save_raw_float32_image(
                pjoin(d, f"frame_{i:06d}.raw"), raw.depth_to_disparity(depth[i])
            )
        if self.cfg.ft.save_depth_visualization:
            from ..utils.visualization import visualize_depth_dir

            visualize_depth_dir(d, d)

    def duplicate_last_depth_stream(self, name: str, dir: str) -> DepthStreamRef:
        """Copy the newest stream's .raw files into `dir` and register the
        new stream (reference pose_optimization.py:262-290; poses/xforms are
        shared solver state here, so only pixel data is copied)."""
        import shutil

        src = self.streams[-1]
        dst = DepthStreamRef(name, dir)
        os.makedirs(pjoin(dst.dir, "depth"), exist_ok=True)
        for i in range(self.store.num_frames):
            shutil.copyfile(
                pjoin(src.dir, "depth", f"frame_{i:06d}.raw"),
                pjoin(dst.dir, "depth", f"frame_{i:06d}.raw"),
            )
        self.streams.append(dst)
        self.save()
        return dst

    def filter_depth(self, radius: int) -> DepthStreamRef:
        """Flow-guided spatio-temporal filter into a `<last>_filtered`
        stream (reference pose_optimization.py:292-326: Copy op +
        FlowGuidedFilter op + saveDepth + save)."""
        from ..io import raw
        from .processor import Op, Processor, ProcessorParams

        src = self.streams[-1]
        name = src.name + "_filtered"
        dst = self.duplicate_last_depth_stream(name, pjoin(src.dir, name))

        depth = self._load_stream_depth(dst)
        proc = Processor(self.store)
        if self.store.camera is None and self.solver_params is not None:
            from ..camera import pose_params_to_camera

            self.store.camera = pose_params_to_camera(
                self.solver_params.pose, self.solver_params.focal,
                self.store.aspect,
            )
        filtered = proc.flow_guided_filter_array(
            depth, ProcessorParams(op=Op.FLOW_GUIDED_FILTER, frame_radius=radius)
        )
        d = pjoin(dst.dir, "depth")
        for i in range(self.store.num_frames):
            raw.save_raw_float32_image(
                pjoin(d, f"frame_{i:06d}.raw"),
                raw.depth_to_disparity(np.asarray(filtered[i])),
            )
        self.save()
        return dst

    # -- constraint construction (reference lib/FlowConstraints.cpp) --------

    MATCH_SEPARATION = 10  # px (reference lib/FlowConstraints.h params default)

    def _build_constraints(self):
        store = self.store
        flow_list = store.load_flow_list()
        # FrameRange windows the constraint set (reference
        # pose_optimization.py:167 resolves FlowConstraintsParams.frameRange;
        # FlowConstraints.cpp:49-84 keeps only in-range pairs/triplets).
        frame_set = set(
            self.cfg.resolved_frame_range(store.num_frames).frames()
        )
        pair_keys = sorted(
            {
                (i, j)
                for (i, j, _) in flow_list
                if i in frame_set and j in frame_set
            }
        )
        triplet_keys = [
            t
            for t in sorted(frame_set)
            if (t - 1) in frame_set
            and (t + 1) in frame_set
            and self._has_flow(t, t - 1)
            and self._has_flow(t, t + 1)
        ]

        pairs, triplets = self._load_constraint_cache(pair_keys, triplet_keys)
        if pairs is None:
            pairs, triplets = self._compute_constraints(pair_keys, triplet_keys)
            self._save_constraint_cache(pairs, triplets)

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

            h, w = store.load_color_down().shape[1:3]
            set_static_flags_from_ransac(
                pair_keys, pairs, (h, w), store.inv_aspect,
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

    def _compute_constraints(self, pair_keys, triplet_keys):
        store = self.store
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
                match_separation=self.MATCH_SEPARATION,
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
                match_separation=self.MATCH_SEPARATION,
            )
        return pairs, triplets

    # -- flow_constraints.dat cache (reference FlowConstraints.cpp:86-93:
    # load if the file exists and params match, else compute and save) ------

    @property
    def _cache_path(self) -> str:
        return pjoin(self.store.base_dir, "flow_constraints.dat")

    def _load_constraint_cache(self, pair_keys, triplet_keys):
        from ..io.flow_constraints_dat import load_flow_constraints_dat

        if not os.path.exists(self._cache_path):
            return None, None
        try:
            ms, cpairs, ctrips = load_flow_constraints_dat(self._cache_path)
        except (ValueError, OSError) as e:
            print(f"ignoring unreadable flow_constraints.dat ({e})")
            return None, None
        # params-match check (reference FlowConstraints.cpp:144-149); the
        # cached key set must cover this run's window.
        if ms != self.MATCH_SEPARATION:
            return None, None
        if not (set(cpairs) >= set(pair_keys) and set(ctrips) >= set(triplet_keys)):
            return None, None
        pairs = {
            k: C.PairConstraints(
                loc0=np.ascontiguousarray(cpairs[k][:, 0]),
                loc1=np.ascontiguousarray(cpairs[k][:, 1]),
                is_static=np.ones(len(cpairs[k]), bool),
            )
            for k in pair_keys
        }
        triplets = {
            t: C.TripletConstraints(
                loc=np.ascontiguousarray(ctrips[t]),
                is_static=np.ones(len(ctrips[t]), bool),
            )
            for t in triplet_keys
        }
        return pairs, triplets

    def _save_constraint_cache(self, pairs, triplets):
        from ..io.flow_constraints_dat import save_flow_constraints_dat

        save_flow_constraints_dat(
            self._cache_path,
            self.MATCH_SEPARATION,
            {
                k: np.stack([pc.loc0, pc.loc1], axis=1)
                for k, pc in pairs.items()
            },
            {t: tc.loc for t, tc in triplets.items()},
        )

    # -- static-flag maintenance (reference lib/FlowConstraints.h:187-189) ---

    def reset_static_flag(self):
        """Mark every constraint static (reference FlowConstraints.cpp:552-571)."""
        for pc in self.pairs.values():
            pc.is_static[:] = True
        for tc in self.triplets.values():
            tc.is_static[:] = True

    def prune_static_flag(self, prune_distance: int = 10):
        """Contaminate neighborhoods of dynamic constraints
        (reference FlowConstraints.cpp:662-748)."""
        down = self.store.load_color_down()
        C.prune_static_flag(
            self.store.num_frames,
            self.pair_keys, self.pairs, self.triplet_keys, self.triplets,
            tuple(down.shape[1:3]), prune_distance,
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
        inputs = PoseOptInputs(
            data=data,
            median_depth=median,
            aspect=self.store.aspect,
            num_frames=self.store.num_frames,
            triplets=triplets,
            dynamic_mask=dyn,
        )
        from ..parallel import mesh as pmesh

        mesh = pmesh.pipeline_mesh()
        if mesh is not None:
            # SPMD solve: constraint pair axis sharded over the mesh,
            # parameters replicated (parallel/mesh.py shard_pose_inputs)
            inputs = pmesh.shard_pose_inputs(inputs, mesh)
        return inputs

    # -- optimization (reference pose_optimization.py:177-240) ---------------

    def optimize_poses(self) -> SolverParams:
        import dataclasses

        inputs = self._make_inputs()
        initial = self.solver_params
        opt = self.cfg.opt
        if initial is None and self.initial_camera is not None:
            # seed from imported GT/COLMAP poses
            # (reference pose_optimization.py:152-158); this is a fresh
            # solve from seeded poses, so the full cold schedule runs
            from ..camera import camera_to_pose_params

            pose, focal = camera_to_pose_params(self.initial_camera)
            initial = pose_opt.default_solver_params(
                self.store.num_frames, focal,
                getattr(opt, "value_xform", "Scale"),
            )._replace(pose=pose)
            opt = dataclasses.replace(opt, warm_start=False)
        self.solver_params = pose_opt.run(opt, inputs, initial=initial)
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
        vx = "Scale" if sp.depth_shift is None else "ScaleShift"
        if (gx, gy, gz) == (1, 1, 1):
            ddesc = vd.XformDesc(type="Depth", depth_type="Global", value_xform=vx)
        else:
            ddesc = vd.XformDesc(
                type="Depth", depth_type="Grid", value_xform=vx,
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
        # One bulk device->host transfer per array. Indexing the committed
        # jax arrays per frame costs a full device round-trip EACH (~25 ms
        # through the tunnel backend); at 100 frames x 5 fields that made
        # every save() ~13 s of pure readbacks.
        vfov = np.asarray(cam.vfov, float)
        hfov = np.asarray(cam.hfov, float)
        position = np.asarray(cam.position, float)
        quaternion = np.asarray(cam.quaternion, float)
        depth_grid = np.asarray(sp.depth_grid, np.float64).reshape(N, -1)
        depth_shift = (
            None
            if sp.depth_shift is None
            else np.asarray(sp.depth_shift, np.float64).reshape(N, -1)
        )
        spatial_grid = np.asarray(sp.spatial_grid, np.float64).reshape(N, -1)
        frames = []
        for i in range(N):
            frames.append(
                vd.DepthFrameInfo(
                    vfov=float(vfov[i]),
                    hfov=float(hfov[i]),
                    position=tuple(position[i]),
                    quaternion=tuple(quaternion[i]),
                    enabled=True,
                    # ScaleShift interleaves [scale, shift] per handle
                    # (reference ValueXform param blocks)
                    depth_params=(
                        depth_grid[i]
                        if depth_shift is None
                        else np.stack(
                            [depth_grid[i], depth_shift[i]], axis=-1
                        ).reshape(-1)
                    ),
                    spatial_params=(
                        spatial_grid[i] if (sx, sy) != (1, 1) else np.zeros(0)
                    ),
                )
            )
        # every registered stream; duplicates share poses/xforms (the
        # reference's copy_poses, pose_optimization.py:242-260)
        depth_streams = [
            vd.DepthStreamInfo(
                ref.name,
                os.path.relpath(ref.dir, store.base_dir),
                ddesc, sdesc, dw, dh, frames,
            )
            for ref in self.streams
        ]
        container = vd.VideoDat(
            pts=list(store.meta.pts),
            color_streams=[
                vd.ColorStreamInfo("full", "color_full", ".png", 21, store.meta.width, store.meta.height),
                vd.ColorStreamInfo("down", "color_down", ".raw", 21, dw, dh),
            ],
            depth_streams=depth_streams,
            duration=store.meta.pts[-1] if store.meta.pts else 0.0,
            width=store.meta.width,
            height=store.meta.height,
        )
        vd.save_video_dat(pjoin(store.base_dir, "video.dat"), container)

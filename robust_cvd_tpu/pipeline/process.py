"""Pipeline orchestrator — the `DatasetProcessor` equivalent.

Reference process.py:52-240: extract -> downscale (x3 resolutions) ->
initial depth -> flow (+masks +stats) -> dynamic masks -> fine-tune.
Stages are idempotent: each checks for existing outputs and skips
(the reference's resumability contract, process.py:150-152 etc.).
"""

from __future__ import annotations

import os
from os.path import join as pjoin

import numpy as np

from ..config import PipelineConfig
from ..io.store import VideoStore
from .depth import compute_initial_depth
from .flow import FlowStage
from .pose import PoseOptimizer
from .video import VideoStage

FLOW_MAX_SIZE = 1024  # reference flow.py:40-42
FLOW_ALIGN = 64


class DatasetProcessor:
    def __init__(self, cfg: PipelineConfig, models: dict | None = None):
        """models: optional dict with 'depth' (MidasV2Adapter) and
        'flow' ((RAFT module, variables)) entries; loaded lazily from
        checkpoint paths otherwise."""
        self.cfg = cfg
        self.models = models or {}

    def out_dir(self, num_frames: int) -> str:
        """R{range}_{flow_ops}_{model} (reference process.py:82-89)."""
        rng = self.cfg.resolved_frame_range(num_frames)
        return pjoin(
            self.cfg.path,
            f"R{rng.to_string().replace(',', '_')}_"
            f"{'_'.join(self.cfg.flow_ops)}_{self.cfg.model_type}",
        )

    def _depth_model(self):
        if "depth" not in self.models:
            from ..models.torch_port import load_midas_v2

            ckpt = pjoin(self.cfg.path, "models", "midas_v21-f6b98070.pt")
            if not os.path.exists(ckpt):
                ckpt = os.environ.get("MIDAS_CHECKPOINT", "")
            if not ckpt or not os.path.exists(ckpt):
                raise FileNotFoundError(
                    "MiDaS checkpoint not found; set MIDAS_CHECKPOINT or place "
                    "models/midas_v21-f6b98070.pt under --path"
                )
            self.models["depth"] = load_midas_v2(ckpt)
        return self.models["depth"]

    def _flow_model(self):
        if "flow" not in self.models:
            from ..models.torch_port import load_raft

            ckpt = pjoin(self.cfg.path, "models", "raft-things.pth")
            if not os.path.exists(ckpt):
                ckpt = os.environ.get("RAFT_CHECKPOINT", "")
            if not ckpt or not os.path.exists(ckpt):
                raise FileNotFoundError(
                    "RAFT checkpoint not found; set RAFT_CHECKPOINT or place "
                    "models/raft-things.pth under --path"
                )
            self.models["flow"] = load_raft(ckpt)
        return self.models["flow"]

    # -- stages --------------------------------------------------------------

    def pipeline(self):
        cfg = self.cfg
        from ..config import echo_non_default
        from ..utils.experiment import StageTracer

        echo_non_default(cfg)  # PRINT_PARAM_IF_NEQ (core/ParamsBase.h:25-28)
        tracer = self.tracer = StageTracer()
        video = VideoStage(cfg.path, cfg.video_file)
        with tracer.span("extract_frames"):
            meta = video.extract_frames()

        with tracer.span("downscale_frames"):
            # --short_side_target applies to the training resolutions only
            # (reference process.py:104-112 passes it for color_down/
            # color_down_png but not the flow resolution)
            video.downscale_frames(
                "color_down", cfg.size, ".raw", cfg.align,
                short_side_target=cfg.short_side_target,
            )
            video.downscale_frames(
                "color_down_png", cfg.size, ".png", cfg.align,
                short_side_target=cfg.short_side_target,
            )
            video.downscale_frames("color_flow", FLOW_MAX_SIZE, ".png", FLOW_ALIGN)

        store = VideoStore.open(cfg.path)
        store.print_info()  # reference DepthVideo::printInfo

        # model load/convert is timed apart from inference so the
        # bench<->CLI stage reconciliation (PERF.md) can separate one-time
        # host costs (torch checkpoint load + layout conversion on the
        # 1-core host) from device compute
        with tracer.span("load_models"):
            depth_model = self._depth_model()
            self._flow_model_pair()

        with tracer.span("compute_initial_depth"):
            depth_stats: dict = {}
            depth = compute_initial_depth(
                store, depth_model, cfg.model_type, stats=depth_stats
            )
        for name, sec in depth_stats.items():
            tracer.spans.append(
                {"name": f"compute_initial_depth/{name}", "sec": sec}
            )

        flow_stage = FlowStage(store, *self._flow_model_pair())
        index_pairs = flow_stage.sample_index_pairs(cfg.flow_ops, meta.num_frames)
        with tracer.span("compute_flow", pairs=len(index_pairs)):
            flow_stage.compute_flow(index_pairs)
        with tracer.span("compute_flow_masks"):
            flow_stage.compute_flow_masks(index_pairs)
        flow_stage.compute_flow_pair_stats(index_pairs)
        if cfg.vis_flow:
            with tracer.span("visualize_flow"):
                flow_stage.visualize_flow(index_pairs)

        # dynamic masks (reference spawns detectron2 Mask R-CNN here,
        # process.py:147-165). Without pretrained segmentation weights the
        # generator is geometric motion segmentation from the flow
        # (pipeline/masks.py); external dynamic_mask/ dirs take precedence.
        if cfg.opt.dynamic_constraints == "Mask":
            from .masks import compute_dynamic_masks, compute_dynamic_masks_rcnn

            mask_stats: dict = {}
            with tracer.span("compute_dynamic_mask"):
                try:
                    if cfg.mask_rcnn_weights and os.path.exists(
                        cfg.mask_rcnn_weights
                    ):
                        compute_dynamic_masks_rcnn(
                            store, cfg.mask_rcnn_weights, stats=mask_stats
                        )
                    else:
                        if cfg.mask_rcnn_weights:
                            print(
                                f"--mask_rcnn_weights "
                                f"{cfg.mask_rcnn_weights!r} not found; "
                                "falling back to motion segmentation"
                            )
                        compute_dynamic_masks(store)
                except Exception as e:  # mask failures do not abort the pipeline
                    print(f"dynamic mask generation failed ({e}); continuing")
            for name, sec in mask_stats.items():
                tracer.spans.append(
                    {"name": f"compute_dynamic_mask/{name}", "sec": sec}
                )

        with tracer.span("fine_tune"):
            tuner = self.fine_tune(store, depth)

        out = self.out_dir(store.num_frames)
        os.makedirs(out, exist_ok=True)
        # fine-tune sub-stage breakdown for the bench reconciliation
        for name, sec in getattr(tuner, "stats", {}).items():
            tracer.spans.append({"name": f"fine_tune/{name}", "sec": sec})
        tracer.save(pjoin(out, "stage_timings.json"))
        return store

    def _flow_model_pair(self):
        m = self._flow_model()
        return (m[0], m[1]) if isinstance(m, tuple) else (m, None)

    def fine_tune(self, store: VideoStore, depth: np.ndarray):
        import time

        t_setup = time.perf_counter()
        cfg = self.cfg
        from ..training.fine_tune import FineTuner, build_clip_data

        pose = PoseOptimizer(cfg, store, f"depth_{cfg.model_type}")
        flow_list = store.load_flow_list()
        for (i, j, _r) in flow_list:
            store.load_flow(i, j)
            store.load_flow_mask(i, j)
        use_temporal = (
            cfg.loss.lambda_smooth_disparity > 0
            or cfg.loss.lambda_smooth_reprojection > 0
            or cfg.loss.lambda_smooth_depth_ratio > 0
        )
        images = store.load_color_down()
        pose_state_override = None
        ref_disp = None
        if cfg.recon == "colmap":
            pose_state_override, ref_disp = self._colmap_fixed_poses(
                store, images.shape[1:3]
            )
        clip = build_clip_data(
            images,
            depth,
            flow_list,
            store.flows,
            {k: np.asarray(v, np.float32) for k, v in store.flow_masks.items()},
            cfg.min_mask_ratio,
            use_temporal,
            ref_disp=ref_disp,
        )
        inputs = pose._make_inputs()
        adapter = self._depth_model()

        # experiment dir: R{range}_{ops}_{model}/<tag> (reference
        # depth_fine_tuning.py:213-215 make_tag)
        from ..utils.experiment import make_tag

        ft_dir = pjoin(self.out_dir(store.num_frames), make_tag(cfg))
        os.makedirs(ft_dir, exist_ok=True)

        # Mesh-data-parallel fine-tuning (the reference's multi-GPU
        # DataParallel path, params.py:260-262): batch axis sharded over
        # ICI, model replicated, gradient psum. None on a single device.
        from ..parallel import mesh as pmesh

        tuner = FineTuner(
            cfg, adapter, clip, inputs, pose=pose, out_dir=ft_dir,
            mesh=pmesh.pipeline_mesh(),
            pose_state_override=pose_state_override,
        )
        # flow/mask loads + clip tensors + constraint build + tuner state:
        # mostly one-time host->device transfers (PERF.md reconciliation)
        tuner.stats["setup_s"] = time.perf_counter() - t_setup
        tuner.run()
        return tuner

    def _colmap_fixed_poses(self, store: VideoStore, shape):
        """recon=colmap inputs: fixed extrinsics/intrinsics from the COLMAP
        metadata npz, plus (scaling=depth) the reference disparity maps used
        for the per-step median depth rescale (reference
        depth_fine_tuning.py:296-318, 494-511).

        scaling=extrinsics reads metadata_scaled.npz from the range dir (the
        poses were pre-scaled by the COLMAP calibration chain,
        io/colmap.py); scaling=depth reads colmap_dense/metadata.npz and the
        depth_colmap_dense/depth/*.raw disparities, nearest-resized to the
        training resolution (the reference hardcodes cv2.resize to
        (224, 384) — we resize to the actual training (H, W) instead, which
        is the same thing for the 384p portrait clips it was written for).
        """
        cfg = self.cfg
        from ..training.fine_tune import PoseState

        if cfg.scaling == "extrinsics":
            meta_file = pjoin(
                self.out_dir(store.num_frames), "metadata_scaled.npz"
            )
        else:
            meta_file = pjoin(cfg.path, "colmap_dense", "metadata.npz")
        if not os.path.exists(meta_file):
            raise FileNotFoundError(
                f"--recon colmap needs {meta_file} (run the COLMAP import "
                "chain, io/colmap.py / io/importers.py, first)"
            )
        with open(meta_file, "rb") as f:
            meta = np.load(f)
            ext = np.asarray(meta["extrinsics"], np.float32)  # (N, 3, 4)
            intr = np.asarray(meta["intrinsics"], np.float32)  # (N, 4) px
        N = store.num_frames
        if ext.shape[0] != N:
            raise ValueError(
                f"metadata npz has {ext.shape[0]} frames, clip has {N}"
            )
        H, W = shape
        ps = PoseState(
            extrinsics=ext,
            intrinsics=intr,
            scales=np.ones((N, H, W), np.float32),
            warp=np.zeros((N, H, W, 2), np.float32),
        )

        ref_disp = None
        if cfg.scaling == "depth":
            from ..io import raw as raw_io

            ref_disp = np.empty((N, H, W), np.float32)
            for i in range(N):
                d = raw_io.load_raw_float32_image(
                    pjoin(
                        cfg.path, "depth_colmap_dense", "depth",
                        f"frame_{i:06d}.raw",
                    )
                )
                ys = (np.arange(H) * d.shape[0] // H).clip(0, d.shape[0] - 1)
                xs = (np.arange(W) * d.shape[1] // W).clip(0, d.shape[1] - 1)
                ref_disp[i] = d[ys[:, None], xs[None, :]]
        return ps, ref_disp

    def process(self):
        if self.cfg.op == "extract_frames":
            VideoStage(self.cfg.path, self.cfg.video_file).extract_frames()
            return None
        return self.pipeline()

"""Test-time depth fine-tuning — the heart of the pipeline.

Re-design of reference depth_fine_tuning.py:207-860 for TPU:
  - the whole clip's frames/flows/masks live as device arrays; a "batch" is
    a set of pair indices gathered inside the jitted step (no DataLoader,
    no host<->device per-batch copies),
  - one fused train step: MiDaS forward + scale-map application + JointLoss
    + Adam update, jitted once per (batch, resolution) shape,
  - pose optimization alternates with training epochs exactly like the
    reference (pose_opt_freq), pulling fresh extrinsics/intrinsics/scale
    maps/warp maps from the solver state (the reference's
    VideoDataset.update_poses, loaders/video_dataset.py:153-217),
  - NaN batches are skipped (reference depth_fine_tuning.py:535-537),
  - pairs with low flow-mask overlap are dropped
    (min_mask_ratio, loaders/video_dataset.py:124-147).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..camera import CameraState, pose_params_to_camera, quat_to_matrix
from ..config import LossParams, PipelineConfig
from ..ops import geometry
from ..solver import pose_opt, xforms
from ..solver.pose_opt import PoseOptInputs
from ..solver.residuals import SolverParams
from ..solver.xforms import GridSpec
from . import losses
from .losses import LossMeta


class ClipData(NamedTuple):
    """Whole-clip device-resident training data (static across epochs)."""

    images: jnp.ndarray  # (N, H, W, 3) in [0, 1]
    depth_orig: jnp.ndarray  # (N, H, W) original (initial) depth
    pair_idx: jnp.ndarray  # (P, 2) int32
    flows: jnp.ndarray  # (P, 2, H, W, 2)
    masks: jnp.ndarray  # (P, 2, H, W) float
    # Temporal neighbors (only when smoothness losses are on); may be None.
    neighbor_idx: Optional[jnp.ndarray] = None  # (P, 4) int32
    flows_n: Optional[jnp.ndarray] = None  # (P, 4, H, W, 2)
    masks_n: Optional[jnp.ndarray] = None  # (P, 4, H, W)
    valid_n: Optional[jnp.ndarray] = None  # (P, 2)
    # COLMAP reference disparity (recon=colmap, scaling=depth): per-frame
    # reference disparity maps; non-finite pixels are invalid. When set, each
    # train step rescales the predicted depth by the per-frame median of
    # (estimated disparity / reference disparity), detached — reference
    # depth_fine_tuning.py:494-511.
    ref_disp: Optional[jnp.ndarray] = None  # (N, H, W)


class PoseState(NamedTuple):
    """Per-frame geometry pulled from the solver after each pose opt
    (the reference's update_poses outputs)."""

    extrinsics: jnp.ndarray  # (N, 3, 4) camera-to-world [R|t]
    intrinsics: jnp.ndarray  # (N, 4) pixel (fx, fy, cx, cy)
    scales: jnp.ndarray  # (N, H, W) depth-xform scale maps
    warp: jnp.ndarray  # (N, H, W, 2) NDC spatial warp maps


def pose_state_from_solver(
    params: SolverParams, shape: Tuple[int, int], aspect: float,
    source_depth: Optional[jnp.ndarray] = None,
) -> PoseState:
    """SolverParams -> per-frame training metadata
    (reference loaders/video_dataset.py:153-217 update_poses).

    Jitted: this runs once per epoch after every pose opt; eager it is
    ~30 op-by-op dispatches (~6 ms each on the tunnel)."""
    if source_depth is None:
        N = params.pose.shape[0]
        source_depth = jnp.ones((N,) + tuple(shape), jnp.float32)
    return _pose_state_jit(params, tuple(shape), float(aspect), source_depth)


@functools.partial(jax.jit, static_argnums=(1,))
def _pose_state_jit(
    params: SolverParams, shape: Tuple[int, int], aspect,
    source_depth: jnp.ndarray,
) -> PoseState:
    N = params.pose.shape[0]
    cam = pose_params_to_camera(params.pose, params.focal, aspect)
    R = jax.vmap(quat_to_matrix)(cam.quaternion)
    ext = jnp.concatenate([R, cam.position[:, :, None]], axis=2)
    intr = geometry.intrinsics_px(cam.vfov, cam.hfov, shape)

    gz, gy, gx = params.depth_grid.shape[1:]
    dspec = GridSpec(gx=gx, gy=gy, gz=gz)
    del N
    scales = jax.vmap(
        lambda g, d: xforms.depth_param_map(g, dspec, shape, d)
    )(params.depth_grid, source_depth)

    sy, sx = params.spatial_grid.shape[1:3]
    warp = jax.vmap(
        lambda g: xforms.spatial_warp_map(g, cubic=sx > 2 or sy > 2, shape=shape)
    )(params.spatial_grid)
    return PoseState(extrinsics=ext, intrinsics=intr, scales=scales, warp=warp)


def build_clip_data(
    images: np.ndarray,
    depth_orig: np.ndarray,
    flow_list: List[Tuple[int, int, float]],
    flows: Dict[Tuple[int, int], np.ndarray],
    masks: Dict[Tuple[int, int], np.ndarray],
    min_mask_ratio: float,
    use_temporal: bool = False,
    ref_disp: Optional[np.ndarray] = None,
) -> ClipData:
    """Assemble device tensors from per-pair host data.

    Pair filtering matches reference loaders/video_dataset.py:124-147: keep
    (i, j) with i < j and min(ratio_ij, ratio_ji) > min_mask_ratio.
    """
    ratio = {(i, j): r for (i, j, r) in flow_list}
    pairs = sorted(
        (i, j)
        for (i, j, r) in flow_list
        if i < j and min(r, ratio.get((j, i), 0.0)) > min_mask_ratio
    )
    if not pairs:
        raise ValueError("no frame pairs pass the mask-ratio filter")

    N = images.shape[0]
    P = len(pairs)
    H, W = images.shape[1:3]
    pair_idx = np.asarray(pairs, np.int32)
    fl = np.stack([np.stack([flows[(i, j)], flows[(j, i)]]) for (i, j) in pairs])
    mk = np.stack(
        [
            np.stack(
                [np.asarray(masks[(i, j)], np.float32), np.asarray(masks[(j, i)], np.float32)]
            )
            for (i, j) in pairs
        ]
    )

    data = dict(
        images=jnp.asarray(images, jnp.float32),
        depth_orig=jnp.asarray(depth_orig, jnp.float32),
        pair_idx=jnp.asarray(pair_idx),
        flows=jnp.asarray(fl, jnp.float32),
        masks=jnp.asarray(mk, jnp.float32),
    )
    if ref_disp is not None:
        data["ref_disp"] = jnp.asarray(ref_disp, jnp.float32)

    if use_temporal:
        nbr = np.zeros((P, 4), np.int32)
        fln = np.zeros((P, 4, H, W, 2), np.float32)
        mkn = np.zeros((P, 4, H, W), np.float32)
        val = np.zeros((P, 2), np.float32)
        for p, (i, j) in enumerate(pairs):
            for a, anchor in enumerate((i, j)):
                bw, fw = anchor - 1, anchor + 1
                ok = (
                    bw >= 0
                    and fw < N
                    and (anchor, bw) in flows
                    and (anchor, fw) in flows
                )
                val[p, a] = float(ok)
                if ok:
                    nbr[p, 2 * a] = bw
                    nbr[p, 2 * a + 1] = fw
                    fln[p, 2 * a] = flows[(anchor, bw)]
                    fln[p, 2 * a + 1] = flows[(anchor, fw)]
                    mkn[p, 2 * a] = masks[(anchor, bw)]
                    mkn[p, 2 * a + 1] = masks[(anchor, fw)]
                else:
                    nbr[p, 2 * a] = anchor
                    nbr[p, 2 * a + 1] = anchor
        data.update(
            neighbor_idx=jnp.asarray(nbr),
            flows_n=jnp.asarray(fln),
            masks_n=jnp.asarray(mkn),
            valid_n=jnp.asarray(val),
        )

    return ClipData(**data)


def colmap_depth_scale(depth, ref):
    """Per-frame scalar scale = median over valid pixels of
    (estimated disparity / reference disparity), gradient-detached
    (reference depth_fine_tuning.py:494-511 computes it with
    .detach().cpu() + np.median). depth, ref: (B, K, H, W).

    Masked median on device: invalid pixels sort to +inf; with m valid
    entries the median is the mean of ranks (m-1)//2 and m//2 of the
    sorted valid values (exactly numpy's even/odd median semantics)."""
    B, K, _, _ = depth.shape
    est_disp = 1.0 / depth
    valid = jnp.isfinite(ref)
    ratio = jnp.where(valid, est_disp / ref, jnp.inf).reshape(B, K, -1)
    srt = jnp.sort(ratio, axis=-1)
    m = valid.reshape(B, K, -1).sum(axis=-1)
    lo = jnp.maximum((m - 1) // 2, 0)
    hi = jnp.maximum(m // 2, 0)
    med = (
        jnp.take_along_axis(srt, lo[..., None], axis=-1)
        + jnp.take_along_axis(srt, hi[..., None], axis=-1)
    )[..., 0] / 2.0
    med = jnp.where(m > 0, med, 1.0)
    return jax.lax.stop_gradient(med)


def _make_step_body(net, loss_opt: LossParams, optimizer, use_temporal: bool):
    """The fused train-step body (unjitted — shared by the per-call step and
    the epoch-scanned program).

    Step signature:
      (params, batch_stats, opt_state, batch_pair_ids, clip, pose_state)
        -> (params, batch_stats, opt_state, loss, parts)
    `batch_pair_ids` (B,) indexes into clip.pair_idx.
    """

    def forward_depth(params, batch_stats, images2, scales):
        """(B, K, H, W, 3) -> (B, K, H, W) depth, K = 2 or 6."""
        B, K, H, W, _ = images2.shape
        x = jnp.reshape(images2, (B * K, H, W, 3))
        x = _normalize(x)
        disp, new_model_state = net.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        depth = 1.0 / (disp + 1e-7)
        depth = depth.reshape(B, K, H, W) * scales
        return depth, new_model_state["batch_stats"]

    def _normalize(x):
        from ..models.midas import normalize_images

        return normalize_images(x)

    def step(params, batch_stats, opt_state, batch_ids, clip: ClipData, ps: PoseState, params_init):
        pair = clip.pair_idx[batch_ids]  # (B, 2)
        if use_temporal:
            nbr = clip.neighbor_idx[batch_ids]  # (B, 4)
            frames = jnp.concatenate([pair, nbr], axis=1)  # (B, 6)
        else:
            frames = pair

        images = clip.images[frames]  # (B, K, H, W, 3)
        depth_orig = clip.depth_orig[frames]
        scales = ps.scales[frames]
        meta = LossMeta(
            extrinsics=ps.extrinsics[frames],
            intrinsics=ps.intrinsics[frames],
            flows=clip.flows[batch_ids],
            masks=clip.masks[batch_ids],
            warp=ps.warp[frames],
            flows_n=clip.flows_n[batch_ids] if use_temporal else None,
            masks_n=clip.masks_n[batch_ids] if use_temporal else None,
            valid_n=clip.valid_n[batch_ids] if use_temporal else None,
        )

        def loss_fn(p):
            depth, new_stats = forward_depth(p, batch_stats, images, scales)
            if clip.ref_disp is not None:
                # COLMAP per-frame median depth rescale (recon=colmap,
                # scaling=depth; reference depth_fine_tuning.py:494-511)
                s = colmap_depth_scale(depth, clip.ref_disp[frames])
                depth = depth * s[..., None, None]
            total, parts = losses.joint_loss(
                loss_opt, images, depth_orig, depth, meta,
                params=p, params_init=params_init,
            )
            return total, (parts, new_stats)

        (loss, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)

        # NaN guard: skip the update if the loss or any gradient is
        # non-finite (reference depth_fine_tuning.py:535-537 guards the loss;
        # guarding gradients too keeps Adam state clean when a single batch
        # produces inf gradients through the depth reciprocal).
        grads_finite = jax.tree.reduce(
            jnp.logical_and,
            jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads),
            jnp.array(True),
        )
        ok = jnp.logical_and(jnp.isfinite(loss), grads_finite)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new_params, params
        )
        new_opt_state = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new_opt_state, opt_state
        )
        new_stats = jax.tree.map(lambda a, b: jnp.where(ok, a, b), new_stats, batch_stats)
        return new_params, new_stats, new_opt_state, loss, parts

    return step


def make_train_step(net, loss_opt: LossParams, optimizer, use_temporal: bool):
    """Jitted single train step (one dispatch per batch)."""
    return jax.jit(_make_step_body(net, loss_opt, optimizer, use_temporal))


def make_epoch_fn(net, loss_opt: LossParams, optimizer, use_temporal: bool,
                  mesh=None):
    """Whole-epoch fused program: `lax.scan` of the train-step body over a
    (S, B) block of batch ids — ONE device dispatch per epoch instead of S.

    On this hardware the per-call dispatch latency (host->TPU tunnel) is far
    larger than a single step's compute, so the reference's DataLoader-style
    per-batch stepping (depth_fine_tuning.py:478) is re-designed as an
    on-device scan over the HBM-resident clip tensors.

    With `mesh`, the per-step batch axis of `batch_ids` (S, B) is sharded
    over the mesh's data axis and parameters/optimizer state are replicated
    — the TPU-native form of the reference's DataParallel training step
    (params.py:260-262 scales batch_size by num_gpus; gradient reduction
    becomes ONE XLA psum over ICI instead of NCCL bucket all-reduce).

    Returns (params, batch_stats, opt_state, losses (S,), parts {k: (S,)}).
    """
    body = _make_step_body(net, loss_opt, optimizer, use_temporal)

    def epoch(params, batch_stats, opt_state, batch_ids, clip: ClipData,
              ps: PoseState, params_init):
        def scan_step(carry, ids):
            p, bs, st = carry
            p, bs, st, loss, parts = body(p, bs, st, ids, clip, ps, params_init)
            return (p, bs, st), (loss, parts)

        (params, batch_stats, opt_state), (losses_s, parts_s) = jax.lax.scan(
            scan_step, (params, batch_stats, opt_state), batch_ids
        )
        return params, batch_stats, opt_state, losses_s, parts_s

    if mesh is None:
        return jax.jit(epoch)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import mesh as pmesh

    repl = pmesh.replicated(mesh)
    blocks = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        epoch,
        in_shardings=(repl, repl, repl, blocks, repl, repl, repl),
        out_shardings=repl,
    )


def _make_eval_body(net, loss_opt: LossParams, use_temporal: bool):
    """Loss-only eval body: forward + JointLoss, no gradient/Adam program
    (the reference's eval_and_save runs the model under torch.no_grad with
    train-mode batch norm, depth_fine_tuning.py:747-748)."""

    def step(params, batch_stats, batch_ids, clip: ClipData, ps: PoseState,
             params_init):
        from ..models.midas import normalize_images

        pair = clip.pair_idx[batch_ids]
        if use_temporal:
            frames = jnp.concatenate([pair, clip.neighbor_idx[batch_ids]], axis=1)
        else:
            frames = pair
        images = clip.images[frames]
        B, K, H, W, _ = images.shape
        x = normalize_images(images.reshape(B * K, H, W, 3))
        disp, _ = net.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        depth = (1.0 / (disp + 1e-7)).reshape(B, K, H, W) * ps.scales[frames]
        if clip.ref_disp is not None:
            # same COLMAP per-frame median rescale as the train step
            # (reference depth_fine_tuning.py:745-765 applies it in eval too)
            s = colmap_depth_scale(depth, clip.ref_disp[frames])
            depth = depth * s[..., None, None]
        meta = LossMeta(
            extrinsics=ps.extrinsics[frames],
            intrinsics=ps.intrinsics[frames],
            flows=clip.flows[batch_ids],
            masks=clip.masks[batch_ids],
            warp=ps.warp[frames],
            flows_n=clip.flows_n[batch_ids] if use_temporal else None,
            masks_n=clip.masks_n[batch_ids] if use_temporal else None,
            valid_n=clip.valid_n[batch_ids] if use_temporal else None,
        )
        total, parts = losses.joint_loss(
            loss_opt, images, clip.depth_orig[frames], depth, meta,
            params=params, params_init=params_init,
        )
        return total, parts

    return step


def make_eval_step(net, loss_opt: LossParams, use_temporal: bool):
    """Jitted loss-only eval for one batch of pair ids."""
    return jax.jit(_make_eval_body(net, loss_opt, use_temporal))


def make_eval_all_fn(net, loss_opt: LossParams, use_temporal: bool):
    """Per-pair losses over the WHOLE pair set in one scanned program
    (vs the reference's per-pair python loop, depth_fine_tuning.py:756-817).

    Returns (losses (P,), parts {k: (P,)})."""
    body = _make_eval_body(net, loss_opt, use_temporal)

    def eval_all(params, batch_stats, clip: ClipData, ps: PoseState,
                 params_init):
        P = clip.pair_idx.shape[0]  # static under jit

        def scan_step(_, pid):
            loss, parts = body(params, batch_stats, pid[None], clip, ps,
                               params_init)
            return None, (loss, parts)

        _, (losses_p, parts_p) = jax.lax.scan(
            scan_step, None, jnp.arange(P, dtype=jnp.int32)
        )
        return losses_p, parts_p

    return jax.jit(eval_all)


class FineTuner:
    """Drives epochs of fused train steps alternating with pose optimization
    (reference DepthFineTuner.fine_tune, depth_fine_tuning.py:311-631).

    With `pose` (the pipeline's PoseOptimizer wrapper) and `out_dir` set, the
    reference's persistence surface is active: video.dat after every pose
    opt, eval/ loss JSONs + depth/scale visualizations at val_epoch_freq,
    checkpoints/ at save_epoch_freq, intermediate depth_e%04d[_opt] streams
    at save_intermediate_depth_streams_freq, and the post filter.
    """

    def __init__(self, cfg: PipelineConfig, adapter, clip: ClipData,
                 pose_inputs: PoseOptInputs, seed: int = 0,
                 pose=None, out_dir: Optional[str] = None, mesh=None,
                 pose_state_override: Optional[PoseState] = None):
        self.cfg = cfg
        self.adapter = adapter
        # recon=colmap: poses/intrinsics are fixed by the COLMAP
        # reconstruction; the solver never runs (reference
        # depth_fine_tuning.py:357-368, 581-583 gate every pose-opt call on
        # recon == "i3d").
        self.pose_state_override = pose_state_override
        if cfg.recon == "colmap" and pose_state_override is None:
            raise ValueError(
                "recon=colmap requires a pose_state_override built from the "
                "COLMAP metadata npz (pipeline/process.py builds it)"
            )
        self.mesh = mesh
        self.n_mesh = 1
        if mesh is not None:
            from ..parallel import mesh as pmesh

            self.n_mesh = mesh.size
            # Placement invariant: with a mesh, every committed array lives
            # ON the mesh (replicated or data-sharded). Mixing mesh-committed
            # solver outputs with single-device clip/param tensors makes XLA
            # compile hidden resharding collectives into every downstream
            # program (and deadlocks oversubscribed CPU test meshes).
            clip = pmesh.replicate(clip, mesh)
        self.clip = clip
        self.pose_inputs = pose_inputs
        self.pose = pose
        self.out_dir = out_dir
        self.rng = np.random.default_rng(seed)

        lr = cfg.ft.learning_rate if cfg.ft.learning_rate > 0 else adapter.learning_rate
        # optimizer registry (reference optimizer/__init__.py: {Adam, RAdam})
        makers = {"adam": optax.adam, "radam": optax.radam}
        kw = (
            {"mu_dtype": jnp.bfloat16}
            if cfg.ft.optimizer_mu_bf16 and cfg.ft.optimizer.lower() == "adam"
            else {}
        )
        self.optimizer = makers[cfg.ft.optimizer.lower()](lr, **kw)
        self.use_temporal = (
            cfg.loss.lambda_smooth_disparity > 0
            or cfg.loss.lambda_smooth_reprojection > 0
            or cfg.loss.lambda_smooth_depth_ratio > 0
        )
        self.step_fn = make_train_step(
            adapter.net, cfg.loss, self.optimizer, self.use_temporal
        )
        self.epoch_fn = make_epoch_fn(
            adapter.net, cfg.loss, self.optimizer, self.use_temporal,
            mesh=self.mesh,
        )
        self._infer_fwd = None
        self.params = adapter.params
        self.batch_stats = adapter.batch_stats
        self.params_init = jax.tree.map(jnp.asarray, adapter.params)
        self.opt_state = self.optimizer.init(self.params)
        if self.mesh is not None:
            from ..parallel import mesh as pmesh

            self.params = pmesh.replicate(self.params, self.mesh)
            self.batch_stats = pmesh.replicate(self.batch_stats, self.mesh)
            self.params_init = pmesh.replicate(self.params_init, self.mesh)
            self.opt_state = pmesh.replicate(self.opt_state, self.mesh)
        self.solver_params: Optional[SolverParams] = None
        self.eval_fn = None
        self.history: List[Dict] = []
        # wall-clock breakdown for the bench<->CLI reconciliation
        # (PERF.md round 4): device compute vs persistence IO
        self.stats: Dict[str, float] = {
            "pose_opt_s": 0.0, "train_steps_s": 0.0, "refresh_s": 0.0,
            "persist_io_s": 0.0,
        }
        self.writer = None
        tb_dir = cfg.ft.tensorboard_log_path or cfg.ft.log_dir
        if not tb_dir and out_dir is not None:
            # reference default: <experiment dir>/tensorboard
            # (depth_fine_tuning.py:386-395)
            import os as _os

            tb_dir = _os.path.join(out_dir, "tensorboard")
        if cfg.ft.save_tensorboard and tb_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(tb_dir)
            except Exception:
                self.writer = None

    def optimize_poses(self):
        t0 = time.perf_counter()
        self.solver_params = pose_opt.run(
            self.cfg.opt, self.pose_inputs, initial=self.solver_params
        )
        shape = self.clip.images.shape[1:3]
        self.pose_state = pose_state_from_solver(
            self.solver_params, shape, self.pose_inputs.aspect, self.clip.depth_orig
        )
        jax.block_until_ready(self.pose_state.extrinsics)
        dt = time.perf_counter() - t0
        self.stats["pose_opt_s"] += dt
        # the cold solve compiles the whole CTF program chain; warm epoch
        # re-solves are the steady state (PERF.md bench<->CLI reconciliation)
        if "pose_opt_first_s" not in self.stats:
            self.stats["pose_opt_first_s"] = dt
        if self.mesh is not None:
            # The SPMD solve leaves its outputs in whatever partitioned
            # layout XLA chose; re-commit the (tiny) pose state replicated
            # so it matches the DP epoch's in_shardings.
            from ..parallel import mesh as pmesh

            self.pose_state = pmesh.replicate(self.pose_state, self.mesh)
        if self.pose is not None:
            # persist camera state + transforms + video.dat after every pose
            # opt (reference pose_optimization.py:240 depth_video.save())
            t1 = time.perf_counter()
            self.pose.solver_params = self.solver_params
            self.pose.save()
            self.stats["persist_io_s"] += time.perf_counter() - t1

    def run(self, num_epochs: Optional[int] = None):
        import os
        from os.path import join as pjoin

        ft = self.cfg.ft
        num_epochs = num_epochs or ft.num_epochs
        P = int(self.clip.pair_idx.shape[0])
        B = max(1, min(ft.batch_size, P))
        if self.mesh is not None:
            # The reference scales the batch by device count under
            # DataParallel (params.py:260-262 "Adjusting batch size");
            # here each mesh device takes `batch_size` pairs of the
            # sharded step. Clips with fewer pairs than the mesh is wide
            # fall through to the (replicated) trailing step below.
            B = min(ft.batch_size * self.n_mesh, P) // self.n_mesh * self.n_mesh
        inter_freq = ft.save_intermediate_depth_streams_freq
        persist = self.pose is not None and self.out_dir is not None

        import contextlib

        @contextlib.contextmanager
        def persist_io():
            t = time.perf_counter()
            yield
            self.stats["persist_io_s"] += time.perf_counter() - t
        use_solver = self.cfg.recon == "i3d"

        if use_solver:
            self.optimize_poses()
        else:
            self.pose_state = self.pose_state_override
            if self.mesh is not None:
                from ..parallel import mesh as pmesh

                self.pose_state = pmesh.replicate(self.pose_state, self.mesh)

        # initial depth stream under the experiment dir (reference
        # depth_fine_tuning.py:360-365: depth_e0000 with intermediate streams
        # on, else the single fine_tuned stream dir)
        if persist:
            with persist_io():
                if inter_freq > 0:
                    self.pose.duplicate_last_depth_stream(
                        "e0000", pjoin(self.out_dir, "depth_e0000")
                    )
                else:
                    # the fine_tuned stream lives at the experiment dir
                    # itself (reference depth_fine_tuning.py:363-365)
                    self.pose.duplicate_last_depth_stream(
                        "fine_tuned", self.out_dir
                    )

        if ft.val_epoch_freq >= 0:
            self.validate(0, 0)

        total_iters = 0
        for epoch in range(num_epochs):
            t0 = time.perf_counter()
            order = self.rng.permutation(P)
            epoch_losses = []
            last_parts = {}
            # Full batches run as ONE scanned device program (dispatch
            # latency >> step compute on this hardware); the trailing
            # partial batch is kept (reference DataLoader drop_last=False)
            # and runs as its own fixed-shape step.
            steps_info = []  # (batch_size, loss, {part: (B,) np}) per step
            S = P // B if B > 0 else 0
            if S > 0:
                blocks = jnp.asarray(order[: S * B].reshape(S, B), jnp.int32)
                (self.params, self.batch_stats, self.opt_state, losses_s,
                 parts_s) = self.epoch_fn(
                    self.params, self.batch_stats, self.opt_state, blocks,
                    self.clip, self.pose_state, self.params_init,
                )
                epoch_losses.append(losses_s)
                last_parts = {k: v[-1] for k, v in parts_s.items()}
                if self.writer is not None:
                    losses_np = np.asarray(losses_s)
                    parts_np = {k: np.asarray(v) for k, v in parts_s.items()}
                    steps_info += [
                        (B, float(losses_np[s]),
                         {k: v[s] for k, v in parts_np.items()})
                        for s in range(S)
                    ]
                total_iters += S * B
            if S * B < P:
                # Trailing partial batch (reference DataLoader
                # drop_last=False). On a mesh this one step per epoch runs
                # REPLICATED (each device computes the full remainder):
                # exact reference semantics — sharding it would need
                # zero-weight padding, which perturbs the BatchNorm batch
                # statistics. Cost: one step/epoch at remainder-sized
                # per-device batch (up to B-1 pairs); if that ever OOMs at
                # extreme resolutions, the options are drop_last or
                # weighted padding.
                ids = jnp.asarray(order[S * B :], jnp.int32)
                (self.params, self.batch_stats, self.opt_state, loss, parts
                 ) = self.step_fn(
                    self.params, self.batch_stats, self.opt_state, ids,
                    self.clip, self.pose_state, self.params_init,
                )
                epoch_losses.append(loss[None])
                last_parts = parts
                if self.writer is not None:
                    steps_info.append(
                        (int(ids.shape[0]), float(loss),
                         {k: np.asarray(v) for k, v in parts.items()})
                    )
                total_iters += int(ids.shape[0])
            mean_loss = float(jnp.mean(jnp.concatenate(epoch_losses)))
            dt_epoch = time.perf_counter() - t0
            self.stats["train_steps_s"] += dt_epoch
            # epoch 0 pays the scanned-epoch program compile; later epochs
            # are the steady state (PERF.md bench<->CLI reconciliation)
            if "train_first_epoch_s" not in self.stats:
                self.stats["train_first_epoch_s"] = dt_epoch
            self.history.append(
                {"epoch": epoch, "loss": mean_loss, "sec": time.perf_counter() - t0}
            )
            if self.writer is not None:
                # Per-iteration scalars gated by --print_freq and image/
                # histogram summaries gated by --display_freq, both on the
                # reference's running pair counter (depth_fine_tuning.py:
                # 542-551: total_iters += batch; log_loss at total_iters %
                # print_freq == 0; write_summary at % display_freq == 0).
                # The epoch runs as one fused device scan, so the per-step
                # losses are logged post-hoc from the scan outputs; image
                # summaries reflect the end-of-epoch state (intermediate
                # weights are not retained by the scan).
                it = total_iters - sum(b for b, _, _ in steps_info)
                display_at = None
                for bsz, lval, prow in steps_info:
                    it += bsz
                    if it % max(1, ft.print_freq) == 0:
                        self.writer.add_scalar("Train/loss", lval, it)
                        for k, arr in prow.items():
                            arr = np.atleast_1d(arr)
                            self.writer.add_scalar(
                                f"Train/{k}/mean", float(arr.mean()), it
                            )
                            self.writer.add_scalar(
                                f"Train/{k}/max", float(arr.max()), it
                            )
                            self.writer.add_scalar(
                                f"Train/{k}/min", float(arr.min()), it
                            )
                    if it % max(1, ft.display_freq) == 0:
                        display_at = it
                if display_at is not None:
                    for k, v in last_parts.items():
                        self.writer.add_histogram(
                            f"Train/{k}", np.asarray(v), display_at
                        )
                    self.writer.add_histogram(
                        "Train/batch_losses",
                        np.concatenate([np.atleast_1d(np.asarray(x))
                                        for x in epoch_losses]),
                        display_at,
                    )
                    self._log_image_grid(display_at)

            if ft.val_epoch_freq >= 0 and (epoch + 1) % ft.val_epoch_freq == 0:
                self.validate(epoch + 1, total_iters)

            if ft.save_checkpoints and (epoch + 1) % max(1, ft.save_epoch_freq) == 0:
                ckpt_dir = pjoin(self.out_dir, "checkpoints") if self.out_dir else "checkpoints"
                self.save_checkpoint(ckpt_dir, epoch + 1)

            save_inter = inter_freq > 0 and (epoch + 1) % inter_freq == 0
            if save_inter:
                # current weights' depth into the epoch's stream (reference
                # depth_fine_tuning.py:576-579 save_depth)
                self.refresh_depth()
                if persist:
                    with persist_io():
                        self.pose.save_depth_to_last_stream(
                            np.asarray(self.current_depth)
                        )

            if use_solver and (epoch + 1) % max(1, self.cfg.ft.pose_opt_freq) == 0:
                if persist and inter_freq > 0:
                    with persist_io():
                        self.pose.duplicate_last_depth_stream(
                            f"e{epoch:04d}_opt",
                            pjoin(self.out_dir, f"depth_e{epoch:04d}_opt"),
                        )
                if not save_inter:
                    self.refresh_depth()
                self.optimize_poses()
                if persist and save_inter:
                    with persist_io():
                        self.pose.save_depth_to_last_stream(
                            np.asarray(self.current_depth)
                        )

            if (
                persist and inter_freq > 0
                and (epoch + 1) % inter_freq == 0
                and epoch + 1 < num_epochs
            ):
                self.pose.duplicate_last_depth_stream(
                    f"e{epoch + 1:04d}",
                    pjoin(self.out_dir, f"depth_e{epoch + 1:04d}"),
                )

        # final validation unless the loop just did it
        # (reference depth_fine_tuning.py:622-627)
        if ft.val_epoch_freq >= 0 and num_epochs % ft.val_epoch_freq != 0:
            self.validate(num_epochs, total_iters)

        self.refresh_depth()
        if persist:
            with persist_io():
                self.pose.save_depth_to_last_stream(
                    np.asarray(self.current_depth)
                )

        if self.cfg.post_filter and self.pose is not None:
            self.pose.filter_depth(self.cfg.filter_radius)
        return self.history

    def _log_image_grid(self, epoch: int):
        """Image / inverse-depth / mask grid for the first training pair
        (reference depth_fine_tuning.py:120-191 image summaries)."""
        if self.writer is None:
            return
        try:
            img = np.asarray(self.clip.images[self.clip.pair_idx[0, 0]])
            depth = np.asarray(self.current_depth[self.clip.pair_idx[0, 0]]) \
                if hasattr(self, "current_depth") else None
            mask = np.asarray(self.clip.masks[0, 0])
            self.writer.add_image("Train/image", img, epoch, dataformats="HWC")
            if depth is not None:
                inv = 1.0 / np.maximum(depth, 1e-7)
                inv = inv / max(float(inv.max()), 1e-9)
                self.writer.add_image(
                    "Train/inv_depth", inv[None], epoch, dataformats="CHW"
                )
            self.writer.add_image(
                "Train/flow_mask", mask[None], epoch, dataformats="CHW"
            )
        except Exception:
            pass  # logging must never break training

    def validate(self, epoch: int, niters: int):
        """Per-pair eval losses + artifacts (reference validate →
        eval_and_save, depth_fine_tuning.py:415-432, 633-860)."""
        import json
        import os
        from os.path import join as pjoin

        if self.out_dir is None:
            return self.eval_pair_losses()

        ft = self.cfg.ft
        eval_dir = pjoin(self.out_dir, "eval")
        os.makedirs(eval_dir, exist_ok=True)
        suf = f"_e{epoch:04d}_iter{niters:06d}"

        entries = self.eval_pair_losses()
        # reference JSON structure: {loss_name: {"[i, j]": val}, "mean": {}}
        loss_dict: Dict[str, Dict[str, float]] = {}
        for e in entries:
            key = str(e["pair"])
            for name, val in e.items():
                if name == "pair":
                    continue
                loss_dict.setdefault(name, {})[key] = val
        loss_dict["mean"] = {
            name: float(np.mean(list(vals.values())))
            for name, vals in loss_dict.items()
        }
        with open(pjoin(eval_dir, f"loss{suf}.json"), "w") as f:
            json.dump(loss_dict, f)

        if self.writer is not None:
            for name, mean in loss_dict["mean"].items():
                self.writer.add_scalar(f"validation/{name}", mean, epoch)

        is_edge_epoch = epoch == 0 or epoch == ft.num_epochs
        if ft.save_eval_images or is_edge_epoch:
            from ..io import raw as raw_io
            from ..io.store import save_png_color
            from ..utils.visualization import visualize_depth

            depth = np.asarray(self.infer_depth())
            disparity = 1.0 / np.maximum(depth, 1e-7)
            dmax = float(disparity.max())
            for i in range(depth.shape[0]):
                pre = pjoin(eval_dir, f"depth_{i:06d}{suf}")
                raw_io.save_raw_float32_image(pre + ".raw", disparity[i])
                save_png_color(
                    pre + ".png",
                    visualize_depth(depth[i], depth_min=1.0 / max(dmax, 1e-7)),
                )

        if ft.save_depth_xform_maps:
            from ..io import raw as raw_io
            from ..io.store import save_png_gray

            scales = np.asarray(self.pose_state.scales)
            smax = float(scales.max())
            for i in range(scales.shape[0]):
                pre = pjoin(eval_dir, f"scale_{i:06d}{suf}")
                raw_io.save_raw_float32_image(pre + ".raw", scales[i])
                save_png_gray(
                    pre + ".png",
                    np.uint8(np.clip(scales[i] / max(smax, 1e-12), 0, 1) * 255),
                )

        if ft.save_scene_flow_vis:
            # per-pair ref->trg 3D scene-flow images
            # (reference depth_fine_tuning.py:653-737 save_scene_flow)
            from ..io.store import save_png_color
            from ..ops import geometry
            from ..utils.visualization import visualize_scene_flow

            depth = np.asarray(self.infer_depth()) * np.asarray(
                self.pose_state.scales
            )
            ext = np.asarray(self.pose_state.extrinsics)
            intr = np.asarray(self.pose_state.intrinsics)
            flows = np.asarray(self.clip.flows)
            pair_idx = np.asarray(self.clip.pair_idx)
            H, W = depth.shape[1:]
            pix = np.asarray(geometry.pixel_grid((H, W)))
            for p in range(pair_idx.shape[0]):
                i, j = int(pair_idx[p, 0]), int(pair_idx[p, 1])
                pts_i = geometry.pixels_to_points(
                    jnp.asarray(intr[i]), jnp.asarray(depth[i]), jnp.asarray(pix)
                )
                world_i = geometry.points_cam_to_world(
                    pts_i, jnp.asarray(ext[i])
                )
                match = pix + flows[p, 0]
                d_j = geometry.grid_sample(
                    jnp.asarray(depth[j])[..., None], jnp.asarray(match)
                )[..., 0]
                pts_j = geometry.pixels_to_points(
                    jnp.asarray(intr[j]), d_j, jnp.asarray(match)
                )
                world_j = geometry.points_cam_to_world(
                    pts_j, jnp.asarray(ext[j])
                )
                sf = np.asarray(world_j - world_i)
                save_png_color(
                    pjoin(eval_dir, f"scene_flow_{i:06d}_{j:06d}{suf}.png"),
                    visualize_scene_flow(sf),
                )

        # stdout table (reference depth_fine_tuning.py:826-858)
        names = [n for n in loss_dict if n != "mean"]
        for e in entries:
            line = f"({e['pair'][0]:3d}, {e['pair'][1]:3d}): "
            line += ", ".join(f"{n}: {e.get(n, 0.0):10.6f}" for n in names)
            print(line)
        print(
            "Mean:        "
            + ", ".join(f"{n}: {loss_dict['mean'][n]:10.6f}" for n in names)
        )
        return loss_dict

    def refresh_depth(self):
        """Re-infer depth for the whole clip with the current weights and
        refresh the pose-opt inputs' source depths (the reference re-saves
        the depth stream and the C++ side reloads it)."""
        t0 = time.perf_counter()
        depth = self.infer_depth()

        # One jitted device program: per-frame median (scale regularizer)
        # + nearest resampling of constraint source depths. The former host
        # path pulled the whole clip to the host every epoch (34 MB D2H on
        # the tunnel + numpy median + gathers: ~4.6 s/epoch); this keeps
        # everything resident and dispatches once.
        if getattr(self, "_refresh_fn", None) is None:
            inv_aspect = 1.0 / self.pose_inputs.aspect

            @jax.jit
            def _resample(depth, loc0, loc1, pair):
                N, h, w = depth.shape
                med = jnp.median(depth.reshape(N, -1), axis=1)

                # NDC -> normalized [0,1] x [0,inv_aspect]
                def to_norm(loc):
                    return jnp.stack(
                        [(loc[..., 0] + 1) / 2,
                         (1 - loc[..., 1]) / 2 * inv_aspect], -1
                    )

                def samp(frames, locs):
                    x = jnp.clip((locs[..., 0] * w).astype(jnp.int32), 0, w - 1)
                    y = jnp.clip(
                        (locs[..., 1] / inv_aspect * h).astype(jnp.int32),
                        0, h - 1,
                    )
                    return depth[frames[:, None], y, x]

                return (
                    samp(pair[:, 0], to_norm(loc0)),
                    samp(pair[:, 1], to_norm(loc1)),
                    med,
                )

            self._refresh_fn = _resample

        data = self.pose_inputs.data
        d0, d1, med = self._refresh_fn(depth, data.loc0, data.loc1, data.pair)
        self.pose_inputs = self.pose_inputs._replace(
            data=data._replace(depth0=d0, depth1=d1),
            median_depth=med,
        )
        self.current_depth = depth
        jax.block_until_ready(depth)
        self.stats["refresh_s"] += time.perf_counter() - t0

    # -- evaluation / persistence artifacts ---------------------------------

    def eval_pair_losses(self) -> List[Dict]:
        """Per-pair loss breakdown via ONE scanned loss-only program
        (reference eval_and_save, depth_fine_tuning.py:633-860)."""
        if self.eval_fn is None:
            self.eval_fn = make_eval_all_fn(
                self.adapter.net, self.cfg.loss, self.use_temporal
            )
        losses_p, parts_p = self.eval_fn(
            self.params, self.batch_stats,
            self.clip, self.pose_state, self.params_init,
        )
        losses_p = np.asarray(losses_p)
        parts_p = {k: np.asarray(v) for k, v in parts_p.items()}
        pair_idx = np.asarray(self.clip.pair_idx)
        out = []
        for p in range(pair_idx.shape[0]):
            entry = {
                "pair": [int(x) for x in pair_idx[p]],
                "loss": float(losses_p[p]),
            }
            entry.update(
                {k: float(np.mean(v[p])) for k, v in parts_p.items()}
            )
            out.append(entry)
        return out

    def save_eval_json(self, out_dir: str, epoch: int):
        import json
        import os

        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"loss_{epoch:04d}.json"), "w") as f:
            json.dump(self.eval_pair_losses(), f, indent=1)

    def save_checkpoint(self, ckpt_dir: str, epoch: int):
        """Model + optimizer checkpoint via orbax (the reference saves torch
        .pth files per epoch, depth_fine_tuning.py:218-220, 568-573)."""
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"{epoch:04d}"))
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            path,
            {
                "params": self.params,
                "batch_stats": self.batch_stats,
                "opt_state": self.opt_state,
            },
            force=True,
        )

    def load_checkpoint(self, ckpt_dir: str, epoch: int):
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"{epoch:04d}"))
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path)
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]
        self.opt_state = restored["opt_state"]

    def infer_depth(self, batch: int = 8) -> jnp.ndarray:
        """Batched whole-clip inference (reference save_depth,
        depth_fine_tuning.py:227-294). With a mesh, the frame axis is
        sharded over the data axis (the DataParallel equivalent,
        monodepth/midas_v2_model.py:35-37) — otherwise every device would
        redundantly re-infer the whole clip at each refresh."""
        from ..models.midas import depth_apply

        if self.mesh is not None:
            from ..parallel import mesh as pmesh

            if getattr(self, "_infer_dp", None) is None:
                def apply_fn(v, x):
                    return depth_apply(self.adapter.net, v, x)

                self._infer_dp = pmesh.data_parallel_fn(apply_fn, self.mesh)
            N = int(self.clip.images.shape[0])
            Np = -(-N // self.n_mesh) * self.n_mesh
            x = pmesh._pad_leading(self.clip.images, Np)
            x = jax.device_put(x, pmesh.batch_sharded(self.mesh))
            depth = self._infer_dp(
                {"params": self.params, "batch_stats": self.batch_stats}, x
            )
            return depth[:N]

        if self._infer_fwd is None:
            # built once: a fresh closure per call would retrace every time
            @jax.jit
            def fwd(params, batch_stats, x):
                return depth_apply(
                    self.adapter.net,
                    {"params": params, "batch_stats": batch_stats},
                    x,
                )

            self._infer_fwd = fwd
        fwd = self._infer_fwd

        N = self.clip.images.shape[0]
        outs = []
        for s in range(0, N, batch):
            chunk = self.clip.images[s : s + batch]
            pad = batch - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate([chunk, chunk[-1:].repeat(pad, 0)], 0)
            d = fwd(self.params, self.batch_stats, chunk)
            outs.append(d[: batch - pad if pad else batch])
        return jnp.concatenate(outs, 0)

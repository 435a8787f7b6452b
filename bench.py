"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: END-TO-END compute sec/frame for a 100-frame 384p clip
(BASELINE.md north star): MiDaS-v2 initial depth, Mask R-CNN dynamic
masks at the reference's test resolution, homography pre-registration +
RAFT flow over ALL hierarchical2 pairs, flow-consistency masks +
constraint building over the one-way pair set, and 10 fine-tuning epochs
each alternating [training epoch -> whole-clip depth refresh ->
pose/deformation optimization] — the reference pipeline's schedule
(depth_fine_tuning.py: pose_opt_freq=1, num_epochs=10, batch 2;
loaders/video_dataset.py:124-147 pair set; dynamic_mask_generation.py
stage). Native-engine file IO is timed and reported separately in
`detail` (the reference's disk round-trips are storage-bound, not
device-bound).

Also emits the warp photo-consistency quality gate: on the analytic golden
scene, the pose/deformation solver must recover most of the consistency gap
opened by corrupted per-frame depth scales (robust_cvd_tpu/quality.py).

Measured as steady-state device compute on the single TPU chip (weights are
random — FLOPs are weight-independent; file IO excluded; compiles are
persistently cached). vs_baseline is null: the reference publishes no
numbers (BASELINE.json published: {}).
"""

import json
import os
import sys
import time

import numpy as np


def make_clip_problem(num_frames=100, samples_per_pair=128, seed=0):
    import jax.numpy as jnp

    from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
    from robust_cvd_tpu.solver.residuals import ConstraintData
    from robust_cvd_tpu.utils.frame_sampling import sample_pairs

    rng = np.random.default_rng(seed)
    pairs = sample_pairs(num_frames, ("hierarchical2",), two_way=True)
    P, C = len(pairs), samples_per_pair
    pair = np.asarray(pairs, np.int32)

    # Synthetic static scene: cameras on a slow arc, plane-ish depth field.
    positions = np.stack(
        [0.05 * np.arange(num_frames), np.zeros(num_frames), np.zeros(num_frames)],
        axis=-1,
    ).astype(np.float32)
    focal = 0.5
    loc0 = rng.uniform(-0.9, 0.9, (P, C, 2)).astype(np.float32)
    depth0 = rng.uniform(1.5, 4.0, (P, C)).astype(np.float32)

    # Exact reprojections -> consistent constraints.
    import jax

    from robust_cvd_tpu.solver import residuals as R

    pose = np.zeros((num_frames, 6), np.float32)
    pose[:, :3] = positions
    fx = np.full(P, focal * 16 / 9, np.float32)
    fy = np.full(P, focal, np.float32)
    p0 = jnp.concatenate([jnp.asarray(loc0), jnp.asarray(depth0)[..., None]], axis=-1)
    world = R.camera_to_world(p0, jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(pose)[pair[:, 0]])
    p1 = R.world_to_camera(world, jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(pose)[pair[:, 1]])
    p1 = np.asarray(jax.block_until_ready(p1))

    # Corrupt per-frame depth scales: the solver's work.
    frame_scale = rng.uniform(0.7, 1.4, num_frames).astype(np.float32)
    data = ConstraintData(
        pair=jnp.asarray(pair),
        loc0=jnp.asarray(loc0),
        loc1=jnp.asarray(p1[..., :2]),
        depth0=jnp.asarray(depth0 / frame_scale[pair[:, 0], None]),
        depth1=jnp.asarray(p1[..., 2] / frame_scale[pair[:, 1], None]),
        weight=jnp.ones((P, C), jnp.float32),
    )
    inputs = PoseOptInputs(
        data=data,
        median_depth=jnp.asarray(2.5 / frame_scale),
        aspect=16 / 9,
        num_frames=num_frames,
    )
    return inputs, pairs


def quality_gate(detail, tiny: bool = False):
    """Golden-scene photo-consistency: GT floor, corrupted ceiling, and the
    solver's recovery (the BASELINE quality metric)."""
    import jax
    import jax.numpy as jnp

    from robust_cvd_tpu import quality
    from robust_cvd_tpu.camera import pose_params_to_camera, quat_to_matrix
    from robust_cvd_tpu.config import PoseOptParams
    from robust_cvd_tpu.ops import geometry
    from robust_cvd_tpu.solver import pose_opt, xforms
    from robust_cvd_tpu.solver.pose_opt import PoseOptInputs
    from robust_cvd_tpu.solver.residuals import ConstraintData
    from robust_cvd_tpu.solver.xforms import GridSpec

    scene = quality.golden_scene(
        num_frames=6 if tiny else 8, shape=(48, 64) if tiny else (96, 128)
    )
    N = scene.images.shape[0]
    H, W = scene.depth.shape[1:]
    aspect = W / H
    rng = np.random.default_rng(0)
    frame_scale = rng.uniform(0.7, 1.4, N).astype(np.float32)
    corrupted = scene.depth * jnp.asarray(1.0 / frame_scale)[:, None, None]

    pairs = scene.pairs
    pair = np.asarray(pairs, np.int32)
    P, C = len(pairs), 64
    xs = rng.uniform(3, W - 4, (P, C)).astype(np.float32)
    ys = rng.uniform(3, H - 4, (P, C)).astype(np.float32)
    depth_gt0 = np.stack(
        [
            np.asarray(scene.depth[i])[
                np.round(ys[p]).astype(int), np.round(xs[p]).astype(int)
            ]
            for p, (i, _) in enumerate(pairs)
        ]
    )
    pix = np.stack([xs, ys], -1)
    intr_i = jnp.asarray(np.stack([np.asarray(scene.intrinsics[i]) for i, _ in pairs]))
    pts = geometry.pixels_to_points(intr_i[:, None, :], jnp.asarray(depth_gt0), jnp.asarray(pix))
    ext_i = jnp.asarray(np.stack([np.asarray(scene.extrinsics[i]) for i, _ in pairs]))
    ext_j = jnp.asarray(np.stack([np.asarray(scene.extrinsics[j]) for _, j in pairs]))
    pts_j = geometry.reproject_points(pts, ext_i[:, None], ext_j[:, None])
    intr_j = jnp.asarray(np.stack([np.asarray(scene.intrinsics[j]) for _, j in pairs]))
    loc1_px = np.asarray(geometry.project(pts_j, intr_j[:, None, :]))
    depth_gt1 = np.asarray(-pts_j[..., 2])

    def to_ndc(x, y):
        return np.stack([x / (W - 1) * 2 - 1, -(y / (H - 1) * 2 - 1)], -1)

    data = ConstraintData(
        pair=jnp.asarray(pair),
        loc0=jnp.asarray(to_ndc(xs, ys), jnp.float32),
        loc1=jnp.asarray(to_ndc(loc1_px[..., 0], loc1_px[..., 1]), jnp.float32),
        depth0=jnp.asarray(depth_gt0 / frame_scale[pair[:, 0], None]),
        depth1=jnp.asarray(depth_gt1 / frame_scale[pair[:, 1], None]),
        weight=jnp.ones((P, C), jnp.float32),
    )
    med = jnp.asarray(np.median(np.asarray(corrupted).reshape(N, -1), 1).astype(np.float32))
    inputs = PoseOptInputs(data=data, median_depth=med, aspect=aspect, num_frames=N)
    opt = PoseOptParams(
        num_steps=2 if tiny else 3,
        ctf_long=3 if tiny else 5,
        ctf_short=2 if tiny else 3,
        lm_max_outer=6 if tiny else 12,
        lm_cg_iters=12 if tiny else 24,
        graduate_deformation_regularization=True,
    )
    solved = pose_opt.run(opt, inputs)

    gz, gy, gx = solved.depth_grid.shape[1:]
    scales = jax.vmap(
        lambda g, d: xforms.depth_param_map(g, GridSpec(gx=gx, gy=gy, gz=gz), (H, W), d)
    )(solved.depth_grid, corrupted)
    corrected = corrupted * scales
    cam = pose_params_to_camera(solved.pose, solved.focal, aspect)
    Rm = jax.vmap(quat_to_matrix)(cam.quaternion)
    ext = jnp.concatenate([Rm, cam.position[:, :, None]], axis=2)
    intr = geometry.intrinsics_px(cam.vfov, cam.hfov, (H, W))

    def m(depth, e=None, i=None):
        return float(
            quality.clip_photo_consistency(
                scene.images, depth,
                scene.extrinsics if e is None else e,
                scene.intrinsics if i is None else i,
                scene.pairs,
            ).l1
        )

    gt, bad = m(scene.depth), m(corrupted)
    solved_err = m(corrected, ext, intr)
    detail["photo_consistency_gt_l1"] = round(gt, 6)
    detail["photo_consistency_corrupted_l1"] = round(bad, 6)
    detail["photo_consistency_solved_l1"] = round(solved_err, 6)
    detail["quality_gap_closed"] = round(
        float(1.0 - (solved_err - gt) / max(bad - gt, 1e-9)), 4
    )


def main():
    from robust_cvd_tpu.parallel.runtime import configure as _configure_jax
    _configure_jax()
    import jax
    import jax.numpy as jnp
    import optax

    from robust_cvd_tpu.config import LossParams, PoseOptParams
    from robust_cvd_tpu.models import raft as raft_mod
    from robust_cvd_tpu.models.midas import MidasNet
    from robust_cvd_tpu.ops import homography as hg
    from robust_cvd_tpu.solver import pose_opt
    from robust_cvd_tpu.training.fine_tune import (
        build_clip_data,
        make_epoch_fn,
        make_train_step,
        pose_state_from_solver,
    )

    # BENCH_TINY=1: shrunken smoke mode so the bench CODE PATH is testable
    # on CPU without the TPU (tests/test_bench_smoke.py). The real-scale
    # path is untouched when the env var is absent.
    TINY = os.environ.get("BENCH_TINY") == "1"

    # ---- per-stage FLOPs + MFU (VERDICT r4 ask #7) -------------------------
    # Program FLOPs from the compiled HLO (Compiled.cost_analysis), MFU
    # against the v5e bf16 peak. Honesty notes: (a) f32-dominated stages
    # (the solver) cap at ~0.5 of this peak by construction; (b) the
    # merge16/block-dense conv lowerings DELIBERATELY add redundant FLOPs
    # (PERF.md), which inflate their MFU — the number ranks levers, it is
    # not a quality score on its own; (c) cost_analysis counts while/scan
    # BODIES ONCE, so loopy programs are accounted structurally: fine-tune
    # from the loop-free per-step program x step count (exact), RAFT from
    # the program + (iters-1) x the scanned body lowered standalone
    # (exact), the LM solver from recorded chunk executions x the static
    # chunk trip count with the inner CG while still counted once (a LOWER
    # bound; the CG cap 16-42x is the dominant undercount — labeled so).
    V5E_PEAK = 197e12

    def _program_tflops(jitted, *args, **kw):
        try:
            cost = jitted.lower(*args, **kw).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) / 1e12
        except Exception:
            return None

    def _mfu(detail, stage, total_tflops, seconds):
        if total_tflops is None or seconds <= 0:
            return
        detail[f"{stage}_tflops"] = round(total_tflops, 3)
        detail[f"{stage}_mfu"] = round(total_tflops / seconds / (V5E_PEAK / 1e12), 4)
    NUM_FRAMES = 8 if TINY else 100
    NUM_EPOCHS = 1 if TINY else 10
    H, W = (32, 64) if TINY else (224, 384)
    rng = np.random.default_rng(0)
    detail = {}

    # ---- stage 1: MiDaS initial depth (batched whole clip) -----------------
    midas = (
        MidasNet(features=16, backbone_layers=(1, 1, 1, 1)) if TINY
        else MidasNet()
    )
    mv = midas.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    images = jnp.asarray(rng.uniform(0, 1, (NUM_FRAMES, H, W, 3)), jnp.float32)
    fwd = jax.jit(
        lambda p, bs, x: midas.apply({"params": p, "batch_stats": bs}, x)
    )
    B = 16

    def midas_pass():
        acc = 0.0
        for s in range(0, NUM_FRAMES, B):
            acc = acc + fwd(mv["params"], mv["batch_stats"], images[s : s + B]).sum()
        # force: unconsumed results can be cancelled on this backend
        return float(acc)

    midas_pass()  # warm: compile (incl. the ragged tail batch) + queue drain
    t0 = time.perf_counter()
    midas_pass()
    detail["midas_initial_depth_s"] = round(time.perf_counter() - t0, 4)
    _fl = _program_tflops(fwd, mv["params"], mv["batch_stats"], images[:B])
    _mfu(detail, "midas_initial_depth",
         None if _fl is None else _fl / B * NUM_FRAMES,
         detail["midas_initial_depth_s"])

    # ---- stage 2: homography pre-registration + RAFT flow ------------------
    inputs, pairs = make_clip_problem(NUM_FRAMES)
    raft = raft_mod.RAFT(iters=2 if TINY else 20)
    rv = raft.init(
        jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3))
    )
    rfwd = jax.jit(lambda v, a, b: raft.apply(v, a, b))
    fb = 16

    def chunk_indices(s):
        chunk = pairs[s : s + fb]
        i_idx = jnp.asarray([c[0] for c in chunk] + [0] * (fb - len(chunk)))
        j_idx = jnp.asarray([c[1] for c in chunk] + [0] * (fb - len(chunk)))
        return i_idx, j_idx

    def homography_pass():
        acc = 0.0
        for s in range(0, len(pairs), fb):
            i_idx, j_idx = chunk_indices(s)
            Hs, reg = hg.register_pairs(images[i_idx], images[j_idx])
            acc = acc + reg.sum()
        return float(acc)

    def raft_pass():
        acc = 0.0
        for s in range(0, len(pairs), fb):
            i_idx, j_idx = chunk_indices(s)
            acc = acc + rfwd(rv, images[i_idx] * 255.0, images[j_idx] * 255.0).sum()
        return float(acc)

    homography_pass()  # warm
    t0 = time.perf_counter()
    homography_pass()
    detail["homography_registration_s"] = round(time.perf_counter() - t0, 4)

    raft_pass()  # warm
    t0 = time.perf_counter()
    raft_pass()
    detail["raft_flow_s"] = round(time.perf_counter() - t0, 4)
    detail["num_pairs"] = len(pairs)
    _i0, _j0 = chunk_indices(0)
    _fl = _program_tflops(rfwd, rv, images[_i0] * 255.0, images[_j0] * 255.0)
    # the 20-iteration refinement runs as lax.scan whose body the HLO cost
    # model counts ONCE; lower the body standalone (abstract avals — no
    # execution) and add the other iters - 1 copies
    _fl_body = None
    try:
        _body = raft_mod._IterBody()
        _bp = {"params": rv["params"]["update_block"]}
        _h8, _w8 = H // 8, W // 8

        def _sd(shape, dt):
            return jax.ShapeDtypeStruct(shape, dt)

        _pyr, _hh, _ww = [], _h8, _w8
        for _ in range(raft.corr_levels):
            _pyr.append(_sd((fb, _h8, _w8, _hh, _ww), jnp.bfloat16))
            _hh, _ww = max(_hh // 2, 1), max(_ww // 2, 1)
        _carry = (
            _sd((fb, _h8, _w8, raft.hidden_dim), jnp.bfloat16),
            _sd((fb, _h8, _w8, 2), jnp.float32),
            _sd((fb, _h8, _w8, 2), jnp.float32),
            _sd((fb, _h8, _w8, raft.context_dim), jnp.bfloat16),
            tuple(_pyr),
        )
        _fl_body = _program_tflops(
            jax.jit(lambda p, c: _body.apply(p, c, None)), _bp, _carry
        )
    except Exception:
        pass
    if _fl is not None and _fl_body is not None:
        _fl = _fl + (raft.iters - 1) * _fl_body
    _mfu(detail, "raft_flow",
         None if _fl is None else _fl * -(-len(pairs) // fb),
         detail["raft_flow_s"])

    # ---- stage 2b: dynamic masks (Mask R-CNN R50-FPN) ----------------------
    # The reference runs detectron2 per frame as a timed pipeline stage
    # (dynamic_mask_generation.py:107-239). Same compute here: detectron2's
    # ResizeShortestEdge(800, 1333) from the clip frames, static-shape Flax
    # R50-FPN forward, mask paste, downsample to the mask contract dims
    # (pipeline/masks.py::compute_dynamic_masks_rcnn without the file IO).
    from robust_cvd_tpu.models.mask_rcnn import (
        MaskRCNN,
        dynamic_mask_from_detections,
    )

    test_size, max_size = (32, 48) if TINY else (800, 1333)
    mscale = test_size / min(H, W)
    if mscale * max(H, W) > max_size:
        mscale = max_size / max(H, W)
    th, tw = int(round(H * mscale)), int(round(W * mscale))
    ph, pw = -(-th // 32) * 32, -(-tw // 32) * 32
    rcnn = MaskRCNN()
    # conv/dense param shapes are input-size independent: init at a small
    # static shape to avoid compiling a throwaway full-size init program
    rcnn_params = rcnn.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3))
    )["params"]

    def mask_frame(params, img):
        net_in = jax.image.resize(img, (th, tw, 3), "bilinear")
        x = jnp.zeros((1, ph, pw, 3), jnp.float32).at[0, :th, :tw].set(net_in)
        det = rcnn.apply({"params": params}, x)
        m = dynamic_mask_from_detections(det, (ph, pw), 0.5)[:th, :tw]
        return jax.image.resize(m.astype(jnp.float32), (H, W), "bilinear")

    # two frames per dispatch, like the pipeline (pipeline/masks.py): the
    # NMS/ROI fori_loops are serial latency-bound, so a vmapped second
    # frame rides along nearly free and the dispatch overhead amortizes
    FB = 2
    mask_frames = jax.jit(
        lambda params, imgs: jax.vmap(lambda im: mask_frame(params, im))(imgs)
    )

    def mask_pass():
        acc = 0.0
        for s in range(0, NUM_FRAMES, FB):
            acc = acc + mask_frames(rcnn_params, images[s : s + FB]).sum()
        return float(acc)

    mask_pass()  # warm
    t0 = time.perf_counter()
    mask_pass()
    detail["dynamic_mask_s"] = round(time.perf_counter() - t0, 4)
    _fl = _program_tflops(mask_frames, rcnn_params, images[:FB])
    _mfu(detail, "dynamic_mask",
         None if _fl is None else _fl * -(-NUM_FRAMES // FB),
         detail["dynamic_mask_s"])

    # ---- stage 2c: consistency masks + constraint building ----------------
    # Host+device hybrid the pipeline runs between flow and pose opt
    # (pipeline/flow.py:151-170 consistent_flow_masks;
    # solver/constraints.py::build_pair_constraints with the native greedy
    # sampler — reference utils/consistency.py + lib/FlowConstraints.cpp).
    from robust_cvd_tpu.pipeline.flow import clip_masks_np
    from robust_cvd_tpu.solver.constraints import (
        build_pair_constraints,
        corner_min_eigenval,
    )

    fwd_pairs = [(i, j) for (i, j) in pairs if i < j]
    rng2 = np.random.default_rng(1)
    flow_px = {
        p: rng2.uniform(-2, 2, (H, W, 2)).astype(np.float32) for p in fwd_pairs
    }
    gray = jnp.asarray(np.asarray(images).mean(-1))
    corners = np.asarray(
        jax.block_until_ready(jax.jit(corner_min_eigenval)(gray))
    )
    # In the pipeline the flows are still DEVICE-RESIDENT from the RAFT
    # stage (FlowStage keeps per-pair slices cached; pipeline/flow.py) —
    # pre-placing them here mirrors that handoff, so the timed stage is
    # mask programs + mask D2H + host greedy constraint building, exactly
    # what a real run pays between flow and pose opt.
    dev_flows = {p: jax.device_put(flow_px[p]) for p in fwd_pairs}

    def constraints_pass():
        n = 0
        CB = 16
        for s in range(0, len(fwd_pairs), CB):
            chunk = fwd_pairs[s : s + CB]
            padded = chunk + [chunk[-1]] * (CB - len(chunk))
            f01 = jnp.stack([dev_flows[p] for p in padded])
            ii = jnp.asarray([i for (i, j) in padded], jnp.int32)
            jj = jnp.asarray([j for (i, j) in padded], jnp.int32)
            m01, _m10 = clip_masks_np(images, f01, -f01, ii, jj, 1.0, 1.0)
            for k, (i, j) in enumerate(chunk):
                pc = build_pair_constraints(
                    corners[i], flow_px[(i, j)], m01[k], H / W
                )
                n += pc.loc0.shape[0]
        return n

    constraints_pass()  # warm (compiles the batched mask program)
    t0 = time.perf_counter()
    constraints_pass()
    detail["consistency_constraints_s"] = round(time.perf_counter() - t0, 4)

    # ---- file IO (native thread-pooled engine), reported separately --------
    import shutil
    import tempfile

    from robust_cvd_tpu import native as native_mod

    tmpd = tempfile.mkdtemp(prefix="bench_io_")
    try:
        depth_np = np.asarray(
            rng.uniform(0.5, 4.0, (NUM_FRAMES, H, W)), np.float32
        )
        io_paths = [f"{tmpd}/depth_{i:06d}.raw" for i in range(NUM_FRAMES)]
        t0 = time.perf_counter()
        wrote = native_mod.write_raw_batch(io_paths, depth_np)
        detail["file_io_write_s"] = round(time.perf_counter() - t0, 4)
        if wrote:
            t0 = time.perf_counter()
            back = native_mod.read_raw_batch(io_paths, H, W, 1)
            detail["file_io_read_s"] = round(time.perf_counter() - t0, 4)
            assert back is not None and float(back.sum()) == float(depth_np.sum())
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)

    # ---- stage 3+4: alternating pose optimization + fine-tune epochs -------
    opt = (
        PoseOptParams(
            graduate_deformation_regularization=True,
            num_steps=2, ctf_long=3, ctf_short=2,
            lm_max_outer=4, lm_cg_iters=8,
        )
        if TINY
        else PoseOptParams(graduate_deformation_regularization=True)
    )

    # training data: the FULL hierarchical2 one-way pair set (the reference's
    # VideoDataset trains over every mask-ratio-passing sampled pair,
    # loaders/video_dataset.py:124-147)
    flow_list, flows, masks = [], {}, {}
    for (i, j) in pairs:
        flow_list.append((i, j, 1.0))
        flows[(i, j)] = np.zeros((H, W, 2), np.float32)
        masks[(i, j)] = np.ones((H, W), np.float32)
    clip = build_clip_data(
        np.asarray(images), np.full((NUM_FRAMES, H, W), 2.0, np.float32),
        flow_list, flows, masks, 0.2,
    )
    optimizer = optax.adam(1e-6)
    opt_state = optimizer.init(mv["params"])
    step = make_train_step(midas, LossParams(), optimizer, use_temporal=False)
    epoch_fn = make_epoch_fn(midas, LossParams(), optimizer, use_temporal=False)
    P_train = int(clip.pair_idx.shape[0])
    detail["num_train_pairs"] = P_train
    bsz = 2
    S_full = P_train // bsz

    # warm-up compiles (persistently cached for the driver's run)
    from robust_cvd_tpu.solver import lm as lm_mod

    # enable solver FLOP accounting now so the warm-ups pre-populate the
    # lowering cache OUTSIDE the timed loop; counter resets before timing
    lm_mod.COST_TRACKER = {"flops": 0.0}
    params = pose_opt.run(opt, inputs, focal=jnp.full((NUM_FRAMES,), 0.5))
    jax.block_until_ready(params.pose)
    warm_params = pose_opt.run(opt, inputs, initial=params)  # warm-start path
    jax.block_until_ready(warm_params.pose)
    ps = pose_state_from_solver(params, (H, W), 16 / 9, clip.depth_orig)
    warm_blocks = jnp.asarray(
        np.arange(S_full * bsz, dtype=np.int32).reshape(S_full, bsz)
    )
    o = epoch_fn(
        mv["params"], mv["batch_stats"], opt_state, warm_blocks, clip, ps,
        mv["params"],
    )
    jax.block_until_ready(o[3])
    if S_full * bsz < P_train:
        tail = jnp.asarray(np.arange(S_full * bsz, P_train, dtype=np.int32))
        o = step(mv["params"], mv["batch_stats"], opt_state, tail, clip, ps,
                 mv["params"])
        jax.block_until_ready(o[3])

    # per-epoch depth refresh (FineTuner.run: train -> refresh_depth ->
    # optimize_poses; training/fine_tune.py:711-750): whole-clip re-inference
    # with the CURRENT weights, D2H readback, and host resampling of the
    # constraint source depths.
    # Device-resident refresh mirroring FineTuner.refresh_depth: batched
    # re-inference + ONE jitted resample program (median + nearest gathers);
    # no whole-clip D2H (training/fine_tune.py:711-758). Kept as a timing
    # copy on purpose: bench isolates steady-state device compute from the
    # FineTuner's persistence hooks — if refresh_depth's sampling
    # convention changes, update this copy to match.

    @jax.jit
    def _resample(depth, loc0, loc1, pair):
        med = jnp.median(depth.reshape(NUM_FRAMES, -1), axis=1)

        def samp(frames, loc):
            x = jnp.clip(((loc[..., 0] + 1) / 2 * W).astype(jnp.int32), 0, W - 1)
            y = jnp.clip(((1 - loc[..., 1]) / 2 * H).astype(jnp.int32), 0, H - 1)
            return depth[frames[:, None], y, x]

        return samp(pair[:, 0], loc0), samp(pair[:, 1], loc1), med

    def refresh(p_cur, bs_cur, inp):
        chunks = []
        for s in range(0, NUM_FRAMES, B):
            chunks.append(fwd(p_cur, bs_cur, images[s : s + B]))
        depth_dev = 1.0 / (jnp.concatenate(chunks) + 1e-7)
        data = inp.data
        d0, d1, med = _resample(depth_dev, data.loc0, data.loc1, data.pair)
        return inp._replace(
            data=data._replace(depth0=d0, depth1=d1),
            median_depth=med,
        )

    refresh(mv["params"], mv["batch_stats"], inputs)  # warm

    p, bs, ostate = mv["params"], mv["batch_stats"], opt_state
    solver_params = None
    lm_mod.COST_TRACKER = {"flops": 0.0}  # count only the timed loop
    t_pose = 0.0
    t_train = 0.0
    t_refresh = 0.0
    for epoch in range(NUM_EPOCHS):
        t1 = time.perf_counter()
        solver_params = pose_opt.run(opt, inputs, initial=solver_params)
        jax.block_until_ready(solver_params.pose)
        ps = pose_state_from_solver(
            solver_params, (H, W), 16 / 9, clip.depth_orig
        )
        t_pose += time.perf_counter() - t1
        t1 = time.perf_counter()
        order = np.random.default_rng(epoch).permutation(P_train)
        # one scanned device program for the full batches (FineTuner.run)
        blocks = jnp.asarray(order[: S_full * bsz].reshape(S_full, bsz), jnp.int32)
        p, bs, ostate, losses_s, _ = epoch_fn(
            p, bs, ostate, blocks, clip, ps, mv["params"]
        )
        if S_full * bsz < P_train:  # trailing partial batch, kept exactly
            ids = jnp.asarray(order[S_full * bsz :], jnp.int32)
            p, bs, ostate, _loss, _ = step(p, bs, ostate, ids, clip, ps, mv["params"])
        # the chained (p, bs, ostate) dependencies force every step; sync:
        float(losses_s[-1])
        t_train += time.perf_counter() - t1
        t1 = time.perf_counter()
        inputs = refresh(p, bs, inputs)
        jax.block_until_ready(inputs.data.depth0)  # keep the stage split honest
        t_refresh += time.perf_counter() - t1
    detail["pose_opt_total_s"] = round(t_pose, 4)
    detail["fine_tune_total_s"] = round(t_train, 4)
    detail["depth_refresh_total_s"] = round(t_refresh, 4)
    # solver MFU: recorded chunk executions, lowered only NOW (outside every
    # timed region). LOWER bound: the CG while body is counted once per
    # outer (see the accounting note at V5E_PEAK); f32 solve additionally
    # caps at ~0.5 bf16 peak.
    _mfu(detail, "pose_opt", lm_mod.flush_cost_tracker() / 1e12, t_pose)
    detail["pose_opt_mfu_note"] = "lower bound: CG loop body counted once/outer"
    lm_mod.COST_TRACKER = None
    # train MFU: the loop-free per-step program is exact; the epoch scan's
    # body is that same step, so epoch = step x S_full (+ trailing batch)
    _fl_step = _program_tflops(
        step, p, bs, ostate, warm_blocks[0], clip, ps, mv["params"]
    )
    _fl_tail = 0.0
    if S_full * bsz < P_train and _fl_step is not None:
        _t = _program_tflops(
            step, p, bs, ostate,
            jnp.asarray(np.arange(S_full * bsz, P_train, dtype=np.int32)),
            clip, ps, mv["params"],
        )
        _fl_tail = _t or 0.0
    _mfu(detail, "fine_tune",
         None if _fl_step is None
         else (_fl_step * S_full + _fl_tail) * NUM_EPOCHS,
         t_train)

    # ---- quality gates ------------------------------------------------------
    quality_gate(detail, tiny=TINY)
    # dynamic machinery gate: moving object + dynamic mask + triplet
    # smoothness + adaptive deformation + deferred spatial opt
    # (robust_cvd_tpu/quality.py::dynamic_solver_gate)
    from robust_cvd_tpu import quality as _quality

    detail.update(_quality.dynamic_solver_gate(tiny=TINY))
    # dynamic-constraint EXCLUSION gate: constraints sampled on the moving
    # object, removed by the production set_static_flags/prune_static_flag
    # path vs left in (robust_cvd_tpu/quality.py::contaminated_constraint_gate)
    detail.update(_quality.contaminated_constraint_gate(tiny=TINY))

    e2e = (
        detail["midas_initial_depth_s"]
        + detail["dynamic_mask_s"]
        + detail["homography_registration_s"]
        + detail["raft_flow_s"]
        + detail["consistency_constraints_s"]
        + t_pose
        + t_train
        + t_refresh
    )
    detail["num_frames"] = NUM_FRAMES
    detail["num_epochs"] = NUM_EPOCHS
    if TINY:
        detail["tiny_smoke_mode"] = True
    detail["device"] = str(jax.devices()[0])
    detail["note"] = (
        "steady-state compute, random weights; full reference schedule: "
        "initial depth + Mask R-CNN dynamic masks + homography + RAFT + "
        "consistency/constraint building + 10x[train epoch incl. trailing "
        "batch -> whole-clip depth refresh -> pose opt]; native file IO "
        "timed separately in detail (not in the headline sum)"
    )

    print(
        json.dumps(
            {
                "metric": "e2e_sec_per_frame",
                "value": round(e2e / NUM_FRAMES, 5),
                "unit": "s/frame",
                "vs_baseline": None,
                "detail": detail,
            }
        )
    )

    # ---- PERF.md stage table (VERDICT r4 ask #8) ---------------------------
    # Printed to stderr (stdout stays ONE JSON line for the driver) so the
    # PERF.md headline can be pasted verbatim instead of hand-transcribed —
    # two consecutive rounds shipped a stale PERF table.
    def _g(k):
        v = detail.get(k)
        mfu = detail.get(k.rsplit("_s", 1)[0].replace("_total", "") + "_mfu")
        return f"{v:.2f} s" + (f" (MFU {mfu:.1%})" if mfu is not None else "")

    rows = [
        ("MiDaS initial depth", "midas_initial_depth_s"),
        ("dynamic masks (Mask R-CNN)", "dynamic_mask_s"),
        ("homography pre-registration", "homography_registration_s"),
        ("RAFT flow", "raft_flow_s"),
        ("consistency masks + constraints", "consistency_constraints_s"),
        ("pose/deformation optimization", "pose_opt_total_s"),
        ("per-epoch depth refresh", "depth_refresh_total_s"),
        ("fine-tuning", "fine_tune_total_s"),
    ]
    table = ["", "PERF.md stage table (paste verbatim):", "| stage | this run |", "|---|---|"]
    for label, key in rows:
        table.append(f"| {label} | {_g(key)} |")
    table.append(
        f"| **headline s/frame** | **{e2e / NUM_FRAMES:.3f}** "
        f"(gates: static {detail.get('quality_gap_closed')}, dynamic "
        f"{detail.get('quality_gap_closed_dynamic')} / vs-floor "
        f"{detail.get('quality_gap_closed_dynamic_vs_floor')}, warp "
        f"{detail.get('spatial_warp_recovery')}, exclusion "
        f"{detail.get('quality_gap_closed_contaminated')} vs "
        f"{detail.get('quality_gap_closed_contaminated_no_exclusion')} off) |"
    )
    print("\n".join(table), file=sys.stderr)


if __name__ == "__main__":
    main()

import numpy as np
import os
from os.path import join as pjoin

from robust_cvd_tpu.io.frames import save_frames_txt
from robust_cvd_tpu.io.store import VideoStore, load_png_gray
from robust_cvd_tpu.pipeline.masks import compute_dynamic_masks, motion_segmentation_mask


def test_motion_segmentation_flags_moving_object():
    h, w = 64, 96
    # rigid background: uniform flow (camera pan); moving object: extra
    # vertical motion in a box
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 3.0
    flow[20:36, 30:50, 1] += 8.0
    dyn = motion_segmentation_mask(flow, sample_stride=4, dynamic_thresh=3.0)
    assert dyn is not None
    assert dyn[24:32, 34:46].mean() > 0.8  # object flagged
    assert dyn[:10, :10].mean() < 0.1  # background static


def test_compute_dynamic_masks_writes_contract(tmp_path):
    base = str(tmp_path)
    h, w = 48, 64
    os.makedirs(pjoin(base, "color_full"))
    save_frames_txt(pjoin(base, "frames.txt"), w, h, [0.0, 1 / 30])
    store = VideoStore.open(base)
    store.color_down = np.zeros((2, h, w, 3), np.float32)
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 2.0
    flow[10:20, 10:20, 1] += 9.0
    store.save_flow(0, 1, flow)
    store.save_flow(1, 0, -flow)
    assert compute_dynamic_masks(store, dilate=2)
    m0 = load_png_gray(pjoin(base, "dynamic_mask", "frame_000000.png"))
    assert m0.shape == (h, w)
    # white = static; the moving box is dark
    assert m0[14, 14] == 0
    assert m0[40, 40] == 255
    # idempotent
    assert compute_dynamic_masks(store)


def test_compute_dynamic_masks_rcnn_contract(tmp_path):
    """Mask R-CNN-backed generation through a fake detectron2 checkpoint
    pickle (random weights at real layout): output contract only."""
    import pickle

    from test_mask_rcnn import _detectron2_layout_state

    base = str(tmp_path / "clip")
    h, w = 48, 64
    os.makedirs(pjoin(base, "color_full"))
    save_frames_txt(pjoin(base, "frames.txt"), w, h, [0.0])
    store = VideoStore.open(base)
    store.color_down = np.random.default_rng(0).uniform(
        0, 1, (1, h, w, 3)
    ).astype(np.float32)

    ckpt = str(tmp_path / "mask_rcnn_R_50_FPN_3x.pkl")
    sd = _detectron2_layout_state(np.random.default_rng(1))
    with open(ckpt, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)

    from robust_cvd_tpu.pipeline.masks import compute_dynamic_masks_rcnn

    assert compute_dynamic_masks_rcnn(store, ckpt, dilate=2)
    m0 = load_png_gray(pjoin(base, "dynamic_mask", "frame_000000.png"))
    assert m0.shape == (h, w)
    assert set(np.unique(m0)) <= {0, 255}
    # idempotent
    assert compute_dynamic_masks_rcnn(store, ckpt)


def test_compute_dynamic_masks_rcnn_mesh_matches_single_device(tmp_path, monkeypatch):
    """The frame-sharded Mask R-CNN mask stage (the reference's
    one-detectron2-worker-per-GPU parallelism, dynamic_mask_generation.py)
    must reproduce the single-device per-frame loop."""
    import pickle
    import shutil

    import jax

    from test_mask_rcnn import _detectron2_layout_state

    base = str(tmp_path / "clip")
    h, w = 48, 64
    n = 9  # > mesh width so the sharded branch engages
    os.makedirs(pjoin(base, "color_full"))
    save_frames_txt(pjoin(base, "frames.txt"), w, h, [i / 30 for i in range(n)])
    store = VideoStore.open(base)
    store.color_down = np.random.default_rng(0).uniform(
        0, 1, (n, h, w, 3)
    ).astype(np.float32)

    ckpt = str(tmp_path / "mask_rcnn_R_50_FPN_3x.pkl")
    sd = _detectron2_layout_state(np.random.default_rng(1))
    with open(ckpt, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)

    from robust_cvd_tpu.pipeline.masks import compute_dynamic_masks_rcnn

    def run():
        assert compute_dynamic_masks_rcnn(
            store, ckpt, dilate=2, test_size=64, max_size=96
        )
        return np.stack([
            load_png_gray(pjoin(base, "dynamic_mask", f"frame_{i:06d}.png"))
            for i in range(n)
        ])

    real_devices = jax.devices()
    with monkeypatch.context() as m:
        m.setattr(jax, "devices", lambda backend=None: real_devices[:1])
        want = run()
    shutil.rmtree(pjoin(base, "dynamic_mask"))
    got = run()
    # boolean masks from thresholded detections; vmap-vs-loop numerics may
    # flip threshold-boundary pixels only
    assert np.mean(got != want) < 0.02

"""End-to-end pipeline smoke test: synthetic clip, tiny random-weight models.

Exercises the full DatasetProcessor orchestration — downscale, initial
depth, flow (RAFT), masks, flow_list, constraints, pose optimization, and
the fine-tune loop — on a 4-frame synthetic clip. Models use random weights
(no checkpoints in this environment); this validates plumbing + shapes +
result-tree contract, not depth quality.
"""

import dataclasses
import json
import os
from os.path import join as pjoin

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from robust_cvd_tpu.config import FineTuneParams, PipelineConfig, PoseOptParams
from robust_cvd_tpu.io.frames import save_frames_txt
from robust_cvd_tpu.io.store import frame_name, save_png_color
from robust_cvd_tpu.models import raft
from robust_cvd_tpu.pipeline.process import DatasetProcessor


class TinyDepthNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(8, (3, 3), padding="SAME")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1))(y)
        return nn.sigmoid(y[..., 0]) + 0.3


class TinyDepthAdapter:
    align = 8
    learning_rate = 1e-4
    lambda_view_baseline = 1e-4

    def __init__(self):
        self.net = TinyDepthNet()
        v = self.net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        self.params = v["params"]
        self.batch_stats = v["batch_stats"]

    def estimate_depth(self, images):
        disp = self.net.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, images
        )
        return 1.0 / (disp + 1e-7)


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("clip"))
    rng = np.random.default_rng(0)
    H, W = 48, 64
    bg = rng.uniform(0, 1, (H, W + 16, 3)).astype(np.float32)
    os.makedirs(pjoin(base, "color_full"))
    for i in range(4):
        save_png_color(
            pjoin(base, "color_full", frame_name(i, ".png")), bg[:, 2 * i : 2 * i + W]
        )
    save_frames_txt(pjoin(base, "frames.txt"), W, H, [i / 30 for i in range(4)])
    return base


def test_full_pipeline(clip_dir):
    raft_model = raft.RAFT(iters=2)
    rv = raft_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )
    cfg = PipelineConfig(
        path=clip_dir,
        size=32,
        align=8,
        model_type="tiny",
        min_mask_ratio=-1.0,  # random-weight flow gives sparse masks
        opt=PoseOptParams(
            num_steps=2, ctf_long=3, ctf_short=2,
            lm_max_outer=4, lm_cg_iters=8,
        ),
        ft=FineTuneParams(num_epochs=1, batch_size=2, pose_opt_freq=5),
    )
    import robust_cvd_tpu.pipeline.process as proc_mod

    old_max, old_align = proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN
    proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN = 64, 8
    try:
        proc = DatasetProcessor(
            cfg,
            models={"depth": TinyDepthAdapter(), "flow": (raft_model, rv)},
        )
        store = proc.process()
    finally:
        proc_mod.FLOW_MAX_SIZE, proc_mod.FLOW_ALIGN = old_max, old_align

    base = clip_dir
    # result-tree contract
    assert os.path.exists(pjoin(base, "color_down", "frame_000000.raw"))
    assert os.path.exists(pjoin(base, "depth_tiny", "depth", "frame_000000.raw"))
    assert os.path.exists(pjoin(base, "flow", "flow_000000_000001.raw"))
    assert os.path.exists(pjoin(base, "flow_mask", "mask_000000_000001.png"))
    flow_list = json.load(open(pjoin(base, "flow_list.json")))
    assert flow_list[0] == ["frame0", "frame1", "mask_ratio"]

    out_dir = proc.out_dir(store.num_frames)
    fine = pjoin(out_dir, "depth_tiny_fine_tuned", "depth", "frame_000000.raw")
    assert os.path.exists(fine)
    from robust_cvd_tpu.io import raw

    disp = raw.load_raw_float32_image(fine)
    assert disp.shape == (24, 32)
    assert np.isfinite(disp).all() and (disp >= 0).all()

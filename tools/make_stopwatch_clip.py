"""Build a 100-frame 384p clip for the bench<->CLI stopwatch reconciliation
(round-4 VERDICT #3): textured translating scene with EXACT ground-truth
flows pre-seeded (random-weight RAFT can't produce usable consistency
masks, and flow-stage idempotency then skips RAFT — those two stages are
reconciled separately against bench's chunk programs), plus synthesized
real-layout random checkpoints for MiDaS / RAFT / Mask R-CNN.

Usage: PYTHONPATH=/root/repo:tests python tools/make_stopwatch_clip.py /tmp/clip100
"""
import os
import pickle
import sys

import numpy as np

from robust_cvd_tpu.io import raw as raw_io
from robust_cvd_tpu.io.frames import save_frames_txt
from robust_cvd_tpu.io.store import save_png_color

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clip100"
# Overridable for the tiny virtual-8-device-mesh CLI drive (verify skill):
# keep the clip natively at the --size resolution so color_down is a no-op
# and the pre-seeded flows match the down resolution.
N = int(os.environ.get("CLIP_N", "100"))
FULL_W = int(os.environ.get("CLIP_W", "384"))
FULL_H = int(os.environ.get("CLIP_H", "224"))
DOWN_W, DOWN_H = FULL_W, FULL_H
SHIFT_FULL = float(os.environ.get("CLIP_SHIFT", "3.0"))  # px/frame
SHIFT_DOWN = SHIFT_FULL * DOWN_W / FULL_W  # exact under proportional scaling


def texture(x, y):
    r = 0.5 + 0.25 * np.sin(0.061 * x) * np.cos(0.053 * y) + 0.15 * np.sin(0.021 * (x + y))
    g = 0.5 + 0.25 * np.cos(0.043 * x + 1.0) * np.sin(0.037 * y) + 0.15 * np.cos(0.017 * (x - y))
    b = 0.5 + 0.25 * np.sin(0.029 * x + 2.0) * np.sin(0.047 * y + 1.0)
    return np.stack([r, g, b], -1).astype(np.float32)


os.makedirs(f"{base}/color_full", exist_ok=True)
os.makedirs(f"{base}/flow", exist_ok=True)
os.makedirs(f"{base}/models", exist_ok=True)

ys, xs = np.mgrid[0:FULL_H, 0:FULL_W].astype(np.float32)
for i in range(N):
    img = texture(xs + i * SHIFT_FULL, ys)
    save_png_color(f"{base}/color_full/frame_{i:06d}.png", img)
save_frames_txt(f"{base}/frames.txt", FULL_W, FULL_H, [i / 30.0 for i in range(N)])

# exact GT flows at the color_down resolution for every hierarchical2 pair
from robust_cvd_tpu.utils.frame_sampling import sample_pairs

pairs = sample_pairs(N, ("hierarchical2",), two_way=True)
for (i, j) in pairs:
    # scene content moves -x as i grows; pixel in i at x matches j at
    # x - (j - i) * shift
    flow = np.zeros((DOWN_H, DOWN_W, 2), np.float32)
    flow[..., 0] = -(j - i) * SHIFT_DOWN
    raw_io.save_raw_float32_image(f"{base}/flow/flow_{i:06d}_{j:06d}.raw", flow)
print(f"{len(pairs)} flow pairs seeded")

# synthesized real-layout random checkpoints
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import torch

from torch_layouts import make_midas_v21_state_dict, make_raft_things_state_dict

torch.save(make_midas_v21_state_dict(), f"{base}/models/midas_v21-f6b98070.pt")
torch.save(make_raft_things_state_dict(), f"{base}/models/raft-things.pth")

from test_mask_rcnn import _detectron2_layout_state

sd = _detectron2_layout_state(np.random.default_rng(5))
with open(f"{base}/models/mask_rcnn_R_50_FPN.pkl", "wb") as f:
    pickle.dump({"model": sd}, f)
print(f"clip ready at {base}")

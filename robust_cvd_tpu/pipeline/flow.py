"""Flow stage: RAFT on sampled frame pairs + consistency masks + pair stats.

Reference flow.py:34-209 + optical_flow_homography.py. TPU redesign: pairs
are batched through one jitted RAFT program instead of a per-pair Python
loop; masks are computed as one batched JAX program.

Pairs are pre-registered with a homography before RAFT and the flow is
un-warped through H^-1 afterwards, like the reference
(optical_flow_homography.py:67-229) — but with corner+patch matching and a
vectorized DLT-RANSAC (ops/homography.py) instead of patented SURF.
"""

from __future__ import annotations

import os
from os.path import join as pjoin
from typing import List, Tuple

import numpy as np

from ..io.store import VideoStore, load_png_color, frame_name
from ..utils.frame_sampling import sample_pairs


def resize_flow(flow: np.ndarray, out_hw) -> np.ndarray:
    """Bilinear resize + vector rescale (reference
    optical_flow_homography.py:232-242 uses cubic; bilinear is our resizer)."""
    import jax.numpy as jnp

    from ..models.layers import resize_bilinear

    H, W = flow.shape[:2]
    oh, ow = out_hw
    out = np.array(resize_bilinear(jnp.asarray(flow), (oh, ow), align_corners=False))
    out[..., 0] *= ow / W
    out[..., 1] *= oh / H
    return out


def consistency_mask(im_ref, im_tgt, flow, threshold) -> np.ndarray:
    """(reference utils/consistency.py:32-50). All (H, W, C)/(H, W, 2)."""
    import jax.numpy as jnp

    from ..ops.geometry import grid_sample, pixel_grid

    H, W = im_ref.shape[:2]
    pix = np.asarray(pixel_grid((H, W)))
    target = pix + flow
    inb = (
        (target[..., 0] >= 0)
        & (target[..., 0] <= W - 1)
        & (target[..., 1] >= 0)
        & (target[..., 1] <= H - 1)
    )
    warped = np.asarray(
        grid_sample(jnp.asarray(im_ref_shape3(im_tgt)), jnp.asarray(target))
    )
    diff = np.sum((im_ref_shape3(im_ref) - warped) ** 2, axis=-1)
    return inb & (diff < threshold)


def im_ref_shape3(x):
    return x[..., None] if x.ndim == 2 else x


def consistent_flow_masks(flow01, flow10, color0, color1,
                          flow_thresh=1.0, color_thresh=1.0):
    """Forward-backward + photometric consistency (reference
    utils/consistency.py:53-67, thresholds (1,1) per flow.py:180-209)."""
    C = color0.shape[-1]
    m01 = consistency_mask(flow01, -flow10, flow01, flow_thresh**2) & consistency_mask(
        color0, color1, flow01, C * color_thresh**2
    )
    m10 = consistency_mask(flow10, -flow01, flow10, flow_thresh**2) & consistency_mask(
        color1, color0, flow10, C * color_thresh**2
    )
    return m01, m10


class FlowStage:
    """Drives flow computation over the sampled pair list."""

    def __init__(self, store: VideoStore, raft_model=None, raft_variables=None,
                 batch_size: int = 16, homography: bool = True):
        self.store = store
        self.model = raft_model
        self.variables = raft_variables
        self.batch_size = batch_size
        self.homography = homography

    def sample_index_pairs(self, flow_ops, num_frames) -> List[Tuple[int, int]]:
        return sample_pairs(num_frames, flow_ops, two_way=True)

    def compute_flow(self, index_pairs: List[Tuple[int, int]]):
        """Batched RAFT over all missing pairs; writes flow at the
        color_down resolution (reference flow.py:84-126)."""
        import jax
        import jax.numpy as jnp

        missing = [
            (i, j)
            for (i, j) in index_pairs
            if not os.path.exists(pjoin(self.store.base_dir, "flow", f"flow_{i:06d}_{j:06d}.raw"))
        ]
        if not missing:
            return
        if self.model is None:
            raise RuntimeError("RAFT model required to compute missing flow")

        flow_dir = pjoin(self.store.base_dir, "color_flow")
        down = self.store.load_color_down()
        dh, dw = down.shape[1:3]

        @jax.jit
        def run(im1, im2):
            return self.model.apply(self.variables, im1, im2)

        from ..ops import homography as hg

        B = self.batch_size
        for s in range(0, len(missing), B):
            chunk = missing[s : s + B]
            im1 = np.stack(
                [load_png_color(pjoin(flow_dir, frame_name(i, ".png"))) for i, _ in chunk]
            )
            im2 = np.stack(
                [load_png_color(pjoin(flow_dir, frame_name(j, ".png"))) for _, j in chunk]
            )
            pad = B - len(chunk)
            if pad:
                im1 = np.concatenate([im1, im1[-1:].repeat(pad, 0)])
                im2 = np.concatenate([im2, im2[-1:].repeat(pad, 0)])
            # homography pre-registration (reference
            # optical_flow_homography.py:139-173): RAFT sees frame2 warped
            # into frame1's frame; flow is un-warped through H^-1 after.
            # One fused TPU program registers the whole chunk.
            Hs = [np.eye(3, dtype=np.float32)] * B
            if self.homography:
                Hs_b, reg = hg.register_pairs(im1, im2)
                Hs = np.asarray(Hs_b)
                im2 = np.asarray(reg)
            flows = np.asarray(
                run(jnp.asarray(im1 * 255.0), jnp.asarray(im2 * 255.0))
            )
            for k, (i, j) in enumerate(chunk):
                flow = flows[k]
                if self.homography:
                    flow = hg.unwarp_flow(flow, Hs[k])
                self.store.save_flow(i, j, resize_flow(flow, (dh, dw)))

    def compute_flow_masks(self, index_pairs, flow_thresh=1.0, color_thresh=1.0):
        """(reference flow.py:180-209)."""
        down = self.store.load_color_down()
        done = set()
        for (i, j) in index_pairs:
            key = (min(i, j), max(i, j))
            if key in done:
                continue
            done.add(key)
            a, b = key
            mask_path = pjoin(self.store.base_dir, "flow_mask", f"mask_{a:06d}_{b:06d}.png")
            if os.path.exists(mask_path):
                continue
            fab = self.store.load_flow(a, b)
            fba = self.store.load_flow(b, a)
            mab, mba = consistent_flow_masks(
                fab, fba, down[a], down[b], flow_thresh, color_thresh
            )
            self.store.save_flow_mask(a, b, mab)
            self.store.save_flow_mask(b, a, mba)

    def visualize_flow(self, index_pairs, warp: bool = True):
        """Write vis_flow/frame_%06d_%06d.png (colors + flow wheel, original
        over masked) and vis_flow_warped/frame_%06d_%06d_warped.png warp
        checks (reference flow.py:128-178)."""
        from ..io.store import save_png_color
        from ..utils.visualization import apply_mask, flow_to_image, warp_by_flow

        vis_dir = pjoin(self.store.base_dir, "vis_flow")
        warp_dir = pjoin(self.store.base_dir, "vis_flow_warped")
        os.makedirs(vis_dir, exist_ok=True)
        if warp:
            os.makedirs(warp_dir, exist_ok=True)

        down = self.store.load_color_down()
        done = set()
        for (i, j) in index_pairs:
            key = (min(i, j), max(i, j))
            if key in done:
                continue
            done.add(key)
            a, b = key
            vis_path = pjoin(vis_dir, f"frame_{a:06d}_{b:06d}.png")
            if os.path.exists(vis_path) and (
                not warp
                or os.path.exists(pjoin(warp_dir, f"frame_{a:06d}_{b:06d}_warped.png"))
            ):
                continue
            flows = [self.store.load_flow(a, b), self.store.load_flow(b, a)]
            masks = [self.store.load_flow_mask(a, b), self.store.load_flow_mask(b, a)]
            colors = [down[a], down[b]]
            flow_ims = [flow_to_image(f).astype(np.float32) / 255.0 for f in flows]
            masked = np.hstack(
                [apply_mask(c, m) for c, m in zip(colors, masks)]
                + [apply_mask(f, m) for f, m in zip(flow_ims, masks)]
            )
            original = np.hstack(colors + flow_ims)
            save_png_color(vis_path, np.vstack((original, masked)))
            if warp:
                for (x, y), color, flow in (
                    ((a, b), down[b], flows[0]),
                    ((b, a), down[a], flows[1]),
                ):
                    save_png_color(
                        pjoin(warp_dir, f"frame_{x:06d}_{y:06d}_warped.png"),
                        np.clip(warp_by_flow(color, flow), 0, 1),
                    )

    def compute_flow_pair_stats(self, index_pairs) -> List[Tuple[int, int, float]]:
        """min two-way mask ratio -> flow_list.json (reference flow.py:44-74)."""
        entries = []
        for (i, j) in index_pairs:
            m = self.store.load_flow_mask(i, j)
            entries.append((i, j, float(np.mean(m))))
        self.store.save_flow_list(entries)
        return entries

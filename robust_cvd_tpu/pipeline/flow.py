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
    if (H, W) == (oh, ow):  # avoid a per-pair device round-trip
        return np.asarray(flow, np.float32)
    out = np.array(resize_bilinear(jnp.asarray(flow), (oh, ow), align_corners=False))
    out[..., 0] *= ow / W
    out[..., 1] *= oh / H
    return out


def _cmask_traced(im_ref, im_tgt, flow, threshold):
    """Pure-JAX consistency mask (reference utils/consistency.py:32-50).
    All (H, W, C)/(H, W, 2); traced, composable under vmap/jit."""
    import jax.numpy as jnp

    from ..ops.geometry import grid_sample_auto, pixel_grid

    H, W = im_ref.shape[:2]
    target = pixel_grid((H, W)) + flow
    inb = (
        (target[..., 0] >= 0)
        & (target[..., 0] <= W - 1)
        & (target[..., 1] >= 0)
        & (target[..., 1] <= H - 1)
    )
    warped = grid_sample_auto(im_ref_shape3(im_tgt), target)
    diff = jnp.sum((im_ref_shape3(im_ref) - warped) ** 2, axis=-1)
    return inb & (diff < threshold)


def im_ref_shape3(x):
    return x[..., None] if x.ndim == 2 else x


def _pair_masks_traced(flow01, flow10, color0, color1, flow_thresh, color_thresh):
    """Both consistency tests per direction share the same warp positions, so
    the reverse flow and the target color are warped as ONE (H, W, 5) gather
    per direction (the gathers dominate this program on the tunnel backend;
    PERF.md). Numerically identical to two separate _cmask_traced calls."""
    import jax.numpy as jnp

    C = color0.shape[-1]

    def one_way(flow_fwd, flow_rev, c_ref, c_tgt):
        # grid_sample_auto: MXU contraction on TPU (the gathers dominate
        # this program — PERF.md round 4); its bf16 value rounding only
        # flips threshold-boundary pixels of the comparison masks, the
        # same tolerance the mesh-equivalence tests already grant.
        from ..ops.geometry import grid_sample_auto as grid_sample
        from ..ops.geometry import pixel_grid

        H, W = flow_fwd.shape[:2]
        target = pixel_grid((H, W)) + flow_fwd
        inb = (
            (target[..., 0] >= 0)
            & (target[..., 0] <= W - 1)
            & (target[..., 1] >= 0)
            & (target[..., 1] <= H - 1)
        )
        stacked = jnp.concatenate([-flow_rev, im_ref_shape3(c_tgt)], axis=-1)
        warped = grid_sample(stacked, target)
        fdiff = jnp.sum((flow_fwd - warped[..., :2]) ** 2, axis=-1)
        cdiff = jnp.sum((im_ref_shape3(c_ref) - warped[..., 2:]) ** 2, axis=-1)
        return inb & (fdiff < flow_thresh**2) & (cdiff < C * color_thresh**2)

    return (
        one_way(flow01, flow10, color0, color1),
        one_way(flow10, flow01, color1, color0),
    )


_BATCHED_MASKS = None
_CMASK_JIT = None
_CLIP_MASKS = None
_POSTPROC = None


def _pack_bits_traced(m):
    """(..., W) bool -> (..., ceil(W/8)) uint8, np.unpackbits-compatible
    (MSB-first). The boolean masks cross the tunnel's slow D2H path
    (~10 MB/s); packing on device cuts that transfer 8x."""
    import jax.numpy as jnp

    W = m.shape[-1]
    pad = (-W) % 8
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
    grouped = m.reshape(m.shape[:-1] + (-1, 8)).astype(jnp.int32)
    wts = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(grouped * wts, axis=-1).astype(jnp.uint8)


def _unpack_bits_np(packed: np.ndarray, width: int) -> np.ndarray:
    return np.unpackbits(packed, axis=-1)[..., :width].astype(bool)


def _clip_masks_fn():
    """Masks from DEVICE-RESIDENT whole-clip colors + chunk flows: colors
    are gathered by frame index inside the program, so nothing but the
    (tiny) index vectors crosses the host boundary. The tunnel's H2D path
    measures ~22 MB/s — re-uploading colors/flows per chunk costs seconds;
    this is the path the flow stage uses when flows are still resident
    from RAFT. Returns BIT-PACKED masks (2, B, H, ceil(W/8)) uint8 — use
    clip_masks_np for numpy bool output."""
    global _CLIP_MASKS
    if _CLIP_MASKS is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnums=(5, 6))
        def f(colors, f01, f10, ii, jj, flow_thresh, color_thresh):
            c0 = colors[ii]
            c1 = colors[jj]
            m01, m10 = jax.vmap(
                _pair_masks_traced, in_axes=(0, 0, 0, 0, None, None)
            )(f01, f10, c0, c1, flow_thresh, color_thresh)
            return _pack_bits_traced(jnp.stack([m01, m10]))

        _CLIP_MASKS = f
    return _CLIP_MASKS


def clip_masks_np(colors, f01, f10, ii, jj, flow_thresh, color_thresh):
    """Host-facing wrapper over _clip_masks_fn: one jitted dispatch, one
    bit-packed D2H, numpy bool (B, H, W) masks both ways."""
    W = int(f01.shape[2])
    packed = np.asarray(
        _clip_masks_fn()(
            colors, f01, f10, ii, jj, float(flow_thresh), float(color_thresh)
        )
    )
    both = _unpack_bits_np(packed, W)
    return both[0], both[1]


def _postproc_fn():
    """Flow post-processing as ONE device program per chunk: un-warp the
    registered flow through H^-1 (reference optical_flow_homography.py:
    204-227) and resize to the color_down resolution with vector rescale —
    the former host path did this per pair (numpy inverse+matmul plus an
    eager device resize dispatch per pair)."""
    global _POSTPROC
    if _POSTPROC is None:
        import functools

        import jax
        import jax.numpy as jnp

        from ..models.layers import resize_bilinear
        from ..ops.geometry import pixel_grid

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def post(flows, Hs, out_hw, use_h):
            B, h, w = flows.shape[:3]
            oh, ow = out_hw
            if use_h:
                pix = pixel_grid((h, w))
                matched = pix[None] + flows
                Hinv = jnp.linalg.inv(Hs)
                ones = jnp.ones(matched.shape[:-1] + (1,), matched.dtype)
                p = jnp.einsum(
                    "bij,bhwj->bhwi", Hinv,
                    jnp.concatenate([matched, ones], -1),
                )
                flows = p[..., :2] / p[..., 2:3] - pix[None]
            if (h, w) != (oh, ow):
                flows = jax.vmap(
                    lambda f: resize_bilinear(f, (oh, ow), align_corners=False)
                )(flows)
                flows = flows * jnp.asarray([ow / w, oh / h], flows.dtype)
            return flows

        _POSTPROC = post
    return _POSTPROC


def _batched_masks_fn():
    """One jitted program: (B,H,W,2)x2 flows + (B,H,W,3)x2 colors -> bool
    masks (B,H,W)x2. The per-pair eager path costs ~1 s/pair on the TPU
    tunnel (op-by-op dispatch); this is the whole chunk in one dispatch."""
    global _BATCHED_MASKS
    if _BATCHED_MASKS is None:
        import functools

        import jax

        _BATCHED_MASKS = jax.jit(
            jax.vmap(_pair_masks_traced, in_axes=(0, 0, 0, 0, None, None)),
            static_argnums=(4, 5),
        )
    return _BATCHED_MASKS


def consistency_mask(im_ref, im_tgt, flow, threshold) -> np.ndarray:
    """(reference utils/consistency.py:32-50). All (H, W, C)/(H, W, 2)."""
    import jax

    global _CMASK_JIT
    if _CMASK_JIT is None:
        _CMASK_JIT = jax.jit(_cmask_traced, static_argnums=(3,))
    return np.asarray(_CMASK_JIT(im_ref, im_tgt, flow, float(threshold)))


def consistent_flow_masks(flow01, flow10, color0, color1,
                          flow_thresh=1.0, color_thresh=1.0):
    """Forward-backward + photometric consistency for ONE pair (reference
    utils/consistency.py:53-67, thresholds (1,1) per flow.py:180-209).
    Convenience wrapper over the batched program."""
    import jax.numpy as jnp

    m01, m10 = consistent_flow_masks_batched(
        jnp.asarray(flow01)[None], jnp.asarray(flow10)[None],
        jnp.asarray(color0)[None], jnp.asarray(color1)[None],
        flow_thresh, color_thresh,
    )
    return m01[0], m10[0]


def consistent_flow_masks_batched(flows01, flows10, colors0, colors1,
                                  flow_thresh=1.0, color_thresh=1.0):
    """Batched consistency masks: one jitted TPU dispatch per chunk of pairs,
    one device->host readback per call. flows (B,H,W,2), colors (B,H,W,C);
    returns two (B,H,W) bool numpy arrays."""
    import jax.numpy as jnp

    m01, m10 = _batched_masks_fn()(
        jnp.asarray(flows01), jnp.asarray(flows10),
        jnp.asarray(colors0), jnp.asarray(colors1),
        float(flow_thresh), float(color_thresh),
    )
    out = np.asarray(jnp.stack([m01, m10]))
    return out[0], out[1]


class FlowStage:
    """Drives flow computation over the sampled pair list."""

    def __init__(self, store: VideoStore, raft_model=None, raft_variables=None,
                 batch_size: int = 16, homography: bool = True):
        self.store = store
        self.model = raft_model
        self.variables = raft_variables
        self.batch_size = batch_size
        self.homography = homography
        # flows kept device-resident between compute_flow and the mask
        # stage (the tunnel's ~22 MB/s H2D makes re-uploads the bottleneck)
        self._dev_flows = {}

    def sample_index_pairs(self, flow_ops, num_frames) -> List[Tuple[int, int]]:
        return sample_pairs(num_frames, flow_ops, two_way=True)

    def compute_flow(self, index_pairs: List[Tuple[int, int]]):
        """Batched RAFT over all missing pairs; writes flow at the
        color_down resolution (reference flow.py:84-126)."""
        import jax
        import jax.numpy as jnp

        # A flow file only satisfies idempotency if it matches the CURRENT
        # color_down resolution — a clip reprocessed with a different
        # --size leaves stale flows behind, and trusting them crashes the
        # mask stage far downstream with an opaque shape error.
        from ..io.raw import cv_type, read_raw_header

        want_hw = None
        for probe in dict.fromkeys(i for p in index_pairs for i in p):
            down = pjoin(
                self.store.base_dir, "color_down", frame_name(probe, ".raw")
            )
            if os.path.exists(down):
                want_hw = read_raw_header(down)[:2]
                break
        # flow is float32 2-channel; a right-sized file with the wrong
        # cv_type would pass a spatial-only check and crash at load time
        want_cvt = cv_type(np.dtype(np.float32), 2)

        def _usable(i, j):
            path = pjoin(self.store.base_dir, "flow", f"flow_{i:06d}_{j:06d}.raw")
            if not os.path.exists(path):
                return False
            if want_hw is None:
                # no color_down probe exists at all (partially-written
                # store): trusting existing flows would reintroduce the
                # stale-resolution crash — recompute instead.
                return False
            have = read_raw_header(path)
            if have[:2] != want_hw or have[2] != want_cvt:
                print(
                    f"flow_{i:06d}_{j:06d}.raw is {have[1]}x{have[0]} "
                    f"cv_type={have[2]} but expected {want_hw[1]}x{want_hw[0]} "
                    f"cv_type={want_cvt}; recomputing"
                )
                return False
            return True

        missing = [(i, j) for (i, j) in index_pairs if not _usable(i, j)]
        if not missing:
            return
        if self.model is None:
            raise RuntimeError("RAFT model required to compute missing flow")

        # commit the RAFT weights once — as host numpy they would re-upload
        # ~20 MB per chunk dispatch (see masks.py for the measured version
        # of this disease)
        self.variables = jax.device_put(self.variables)

        flow_dir = pjoin(self.store.base_dir, "color_flow")
        down = self.store.load_color_down()
        dh, dw = down.shape[1:3]

        # variables as explicit jit arguments (closure constants get baked
        # into the lowered program — cache-unfriendly on the remote-compile
        # backend)
        @jax.jit
        def run(variables, im1, im2):
            return self.model.apply(variables, im1, im2)

        from ..ops import homography as hg

        # With >1 device the whole chunk program (registration + RAFT +
        # un-warp/resize) shards its pair axis over the mesh — the
        # TPU-native form of the reference's DataParallel flow net
        # (optical_flow_homography.py:252); chunks grow by the device
        # count, mirroring the reference's num-GPU batch scaling.
        from ..parallel import mesh as pmesh

        mesh = pmesh.pipeline_mesh()
        if mesh is not None:
            n_dev = mesh.size
            use_h = self.homography

            def chunk_fn(variables, ims):
                im1, im2 = ims
                if use_h:
                    Hs, im2r = hg.register_pairs(im1, im2)
                else:
                    Hs = jnp.broadcast_to(
                        jnp.eye(3, dtype=jnp.float32), (im1.shape[0], 3, 3)
                    )
                    im2r = im2
                flows_reg = self.model.apply(
                    variables, im1 * 255.0, im2r * 255.0
                )
                return _postproc_fn()(flows_reg, Hs, (dh, dw), use_h)

            chunk_dp = pmesh.data_parallel_fn(chunk_fn, mesh)
            v_rep = pmesh.replicate(self.variables, mesh)
            b_sh = pmesh.batch_sharded(mesh)
            repl = pmesh.replicated(mesh)

        B = self.batch_size
        if mesh is not None:
            # device-count batch scaling, capped at the (device-multiple)
            # work actually available so tiny clips don't pad 25x
            B = min(B * n_dev, -(-len(missing) // n_dev) * n_dev)
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
            # Registration, RAFT, unwarp, and the resize to color_down all
            # stay on device; ONE chunk D2H feeds the disk writes and the
            # per-pair device slices stay cached for the mask stage.
            if mesh is not None:
                ims = (
                    jax.device_put(jnp.asarray(im1, jnp.float32), b_sh),
                    jax.device_put(jnp.asarray(im2, jnp.float32), b_sh),
                )
                # replicate so per-pair slices cached for the mask stage
                # stay mesh-coherent (a batch-sharded slice would commit
                # to one device and poison downstream stacks)
                flows_down = jax.device_put(chunk_dp(v_rep, ims), repl)
            else:
                im1_d = jnp.asarray(im1, jnp.float32)
                if self.homography:
                    Hs_d, im2_d = hg.register_pairs(im1_d, im2)
                else:
                    Hs_d = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
                    im2_d = jnp.asarray(im2, jnp.float32)
                flows_reg = run(self.variables, im1_d * 255.0, im2_d * 255.0)
                flows_down = _postproc_fn()(
                    flows_reg, Hs_d, (dh, dw), self.homography
                )
            flows_host = np.asarray(flows_down)
            for k, (i, j) in enumerate(chunk):
                self.store.save_flow(i, j, flows_host[k])
                self._dev_flows[(i, j)] = flows_down[k]

    def compute_flow_masks(self, index_pairs, flow_thresh=1.0, color_thresh=1.0):
        """(reference flow.py:180-209). Chunks of pairs go through ONE jitted
        TPU program each (the eager per-pair path costs ~1 s/pair in
        dispatch overhead on the tunnel); the tail chunk is padded to keep a
        single compiled shape."""
        import jax
        import jax.numpy as jnp

        down = self.store.load_color_down()
        missing, done = [], set()
        for (i, j) in index_pairs:
            key = (min(i, j), max(i, j))
            if key in done:
                continue
            done.add(key)
            a, b = key
            mask_path = pjoin(self.store.base_dir, "flow_mask", f"mask_{a:06d}_{b:06d}.png")
            if not os.path.exists(mask_path):
                missing.append(key)
        if not missing:
            self._dev_flows.clear()
            return
        colors_dev = jnp.asarray(down)

        # Mesh path: the per-chunk mask program shards its pair axis over
        # the data axis (colors replicated — they're gathered by frame
        # index inside the program), chunks grow by the device count.
        from ..parallel import mesh as pmesh

        mesh = pmesh.pipeline_mesh()
        if mesh is not None:
            n_dev = mesh.size
            ft, ct = float(flow_thresh), float(color_thresh)

            def mask_fn(colors, x):
                f01, f10, ii, jj = x
                c0 = colors[ii]
                c1 = colors[jj]
                m01, m10 = jax.vmap(
                    _pair_masks_traced, in_axes=(0, 0, 0, 0, None, None)
                )(f01, f10, c0, c1, ft, ct)
                # batch axis LEADING (the single-device program stacks the
                # two directions first, which cannot shard)
                return _pack_bits_traced(jnp.stack([m01, m10], axis=1))

            mask_dp = pmesh.data_parallel_fn(mask_fn, mesh)
            colors_rep = pmesh.replicate(colors_dev, mesh)
            b_sh = pmesh.batch_sharded(mesh)
            flow_place = pmesh.replicated(mesh)
        else:
            flow_place = None

        # Flows computed this run are still device-resident; resume-case
        # flows are read from disk, with every upload issued up front so
        # the slow tunnel H2D (~22 MB/s) pipelines behind the mask programs.
        for key in missing:
            for d in (key, key[::-1]):
                if d not in self._dev_flows:
                    # flow_place None = default single-device placement
                    self._dev_flows[d] = jax.device_put(
                        self.store.load_flow(*d), flow_place
                    )
        B = self.batch_size
        if mesh is not None:
            B = min(B * n_dev, -(-len(missing) // n_dev) * n_dev)
        W = int(down.shape[2])
        for s in range(0, len(missing), B):
            chunk = missing[s : s + B]
            padded = chunk + [chunk[-1]] * (B - len(chunk))
            f01 = jnp.stack([self._dev_flows[(a, b)] for (a, b) in padded])
            f10 = jnp.stack([self._dev_flows[(b, a)] for (a, b) in padded])
            ii = jnp.asarray([a for (a, b) in padded], jnp.int32)
            jj = jnp.asarray([b for (a, b) in padded], jnp.int32)
            if mesh is not None:
                packed = np.asarray(mask_dp(
                    colors_rep,
                    tuple(jax.device_put(t, b_sh) for t in (f01, f10, ii, jj)),
                ))
                both = _unpack_bits_np(packed, W)  # (B, 2, H, W)
                m01, m10 = both[:, 0], both[:, 1]
            else:
                m01, m10 = clip_masks_np(
                    colors_dev, f01, f10, ii, jj, flow_thresh, color_thresh
                )
            for k, (a, b) in enumerate(chunk):
                self.store.save_flow_mask(a, b, m01[k])
                self.store.save_flow_mask(b, a, m10[k])
        # the mask stage is the cache's only consumer; release the
        # device-resident flows (572 pairs x 224x384x2 f32 ~ 200 MB HBM
        # that would otherwise sit through every fine-tune epoch)
        self._dev_flows.clear()

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

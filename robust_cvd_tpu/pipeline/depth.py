"""Initial depth stage: batched MiDaS inference over the whole clip.

Reference process.py:115-124 + depth_fine_tuning.py save_depth (227-294):
per-frame DataLoader loop on GPU; here one jitted batched forward per chunk.
Writes `depth_{model}/depth/frame_%06d.raw` (disparity-encoded).
"""

from __future__ import annotations

import os
from os.path import join as pjoin

import numpy as np

from ..io.store import VideoStore


def compute_initial_depth(
    store: VideoStore, adapter, model_type: str, batch: int = 16,
    stats: dict | None = None,
) -> np.ndarray:
    stream = f"depth_{model_type}"
    out_dir = store.depth_dir(stream)
    if os.path.isdir(out_dir) and len(os.listdir(out_dir)) >= store.num_frames:
        return store.load_depth_stream(stream)

    import time

    import jax
    import jax.numpy as jnp

    if stats is None:
        stats = {}

    # One-time weight upload, timed apart from inference: ~420 MB of f32
    # params over the tunnel link dominates a cold CLI run of this stage
    # (PERF.md bench<->CLI reconciliation).
    t0 = time.perf_counter()
    adapter.params = jax.device_put(adapter.params)
    if adapter.batch_stats is not None:
        adapter.batch_stats = jax.device_put(adapter.batch_stats)
    jax.block_until_ready((adapter.params, adapter.batch_stats))
    stats["weights_h2d_s"] = time.perf_counter() - t0

    images = store.load_color_down()
    N = images.shape[0]

    from ..parallel import mesh as pmesh

    mesh = pmesh.pipeline_mesh()
    if mesh is not None:
        # Batch-parallel over the mesh (reference wraps MiDaS in
        # DataParallel, monodepth/midas_v2_model.py:35-37): the whole clip
        # as ONE SPMD program, frame axis sharded over ICI.
        from ..models.midas import depth_apply

        def apply_fn(variables, x):
            return depth_apply(adapter.net, variables, x)

        t0 = time.perf_counter()
        depth = np.asarray(
            pmesh.infer_data_parallel(
                apply_fn,
                {"params": adapter.params, "batch_stats": adapter.batch_stats},
                jnp.asarray(images),
                mesh,
            )
        )
        stats["first_dispatch_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        store.save_depth_stream(stream, depth)
        stats["save_io_s"] = time.perf_counter() - t0
        return depth

    # variables as EXPLICIT jit arguments, never closure constants: a
    # closure-captured 420 MB param tree gets baked into the lowered
    # program, which defeats the persistent compile cache and overflows
    # the remote-compile request (HTTP 413 on the tunnel backend).
    from ..models.midas import depth_apply

    variables = {"params": adapter.params, "batch_stats": adapter.batch_stats}
    fwd = jax.jit(lambda v, x: depth_apply(adapter.net, v, x))

    outs = []
    for s in range(0, N, batch):
        t0 = time.perf_counter()
        chunk = images[s : s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
        d = np.asarray(fwd(variables, jnp.asarray(chunk)))
        outs.append(d[: batch - pad if pad else batch])
        # first dispatch carries compile / executable load; the rest is
        # steady-state inference (what bench.py times)
        key = "first_dispatch_s" if s == 0 else "steady_infer_s"
        stats[key] = stats.get(key, 0.0) + time.perf_counter() - t0
    depth = np.concatenate(outs, 0)
    t0 = time.perf_counter()
    store.save_depth_stream(stream, depth)
    stats["save_io_s"] = time.perf_counter() - t0
    return depth

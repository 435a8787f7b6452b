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
    store: VideoStore, adapter, model_type: str, batch: int = 16
) -> np.ndarray:
    stream = f"depth_{model_type}"
    out_dir = store.depth_dir(stream)
    if os.path.isdir(out_dir) and len(os.listdir(out_dir)) >= store.num_frames:
        return store.load_depth_stream(stream)

    import jax
    import jax.numpy as jnp

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

        depth = np.asarray(
            pmesh.infer_data_parallel(
                apply_fn,
                {"params": adapter.params, "batch_stats": adapter.batch_stats},
                jnp.asarray(images),
                mesh,
            )
        )
        store.save_depth_stream(stream, depth)
        return depth

    @jax.jit
    def fwd(x):
        return adapter.estimate_depth(x)

    outs = []
    for s in range(0, N, batch):
        chunk = images[s : s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
        d = np.asarray(fwd(jnp.asarray(chunk)))
        outs.append(d[: batch - pad if pad else batch])
    depth = np.concatenate(outs, 0)
    store.save_depth_stream(stream, depth)
    return depth

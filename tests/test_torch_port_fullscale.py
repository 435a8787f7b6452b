"""Full-scale torch->flax weight-port fidelity.

Builds reference-layout state dicts at REAL checkpoint shapes (random
values; tests/torch_layouts.py — the RAFT layout is key/shape-identical to
the reference model's 179-tensor state_dict) and checks that conversion
produces exactly the parameter tree the flax modules expect. This catches
key-mapping, missing-tensor, and transpose errors that tiny synthetic
layouts miss (reference checkpoints: monodepth/midas_v2_model.py:10-12,
optical_flow_homography.py:245-258).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_cvd_tpu.models import raft as raft_mod
from robust_cvd_tpu.models.midas import MidasNet
from robust_cvd_tpu.models.torch_port import convert_midas_v2, convert_raft

from torch_layouts import make_midas_v21_state_dict, make_raft_things_state_dict


def tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        jax.tree_util.keystr(path): tuple(np.shape(leaf)) for path, leaf in flat
    }


def assert_same_tree(converted, expected, what):
    cs, es = tree_shapes(converted), tree_shapes(expected)
    missing = sorted(set(es) - set(cs))
    extra = sorted(set(cs) - set(es))
    mismatch = sorted(
        (k, cs[k], es[k]) for k in set(cs) & set(es) if cs[k] != es[k]
    )
    assert not missing, f"{what}: converter missing {missing[:8]} (+{len(missing)})"
    assert not extra, f"{what}: converter extra {extra[:8]} (+{len(extra)})"
    assert not mismatch, f"{what}: shape mismatches {mismatch[:8]}"


def test_midas_v2_fullscale_convert_and_forward():
    sd = make_midas_v21_state_dict()
    params, stats = convert_midas_v2(sd)

    net = MidasNet()
    variables = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    assert_same_tree(params, variables["params"], "midas params")
    assert_same_tree(stats, variables["batch_stats"], "midas batch_stats")

    disp = net.apply(
        {
            "params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats),
        },
        jnp.ones((1, 64, 64, 3)),
    )
    assert disp.shape == (1, 64, 64)
    assert bool(jnp.isfinite(disp).all())


def test_raft_fullscale_convert_and_forward():
    sd = make_raft_things_state_dict()
    params, stats = convert_raft(sd)

    net = raft_mod.RAFT(iters=2)
    variables = jax.eval_shape(
        lambda: net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)),
        )
    )
    assert_same_tree(params, variables["params"], "raft params")
    assert_same_tree(stats, variables.get("batch_stats", {}), "raft batch_stats")

    flow = net.apply(
        {
            "params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats),
        },
        jnp.ones((1, 64, 64, 3)) * 128.0,
        jnp.ones((1, 64, 64, 3)) * 128.0,
    )
    assert flow.shape == (1, 64, 64, 2)
    assert bool(jnp.isfinite(flow).all())

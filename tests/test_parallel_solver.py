"""SPMD pose-opt: the solver sharded over the constraint axis of a device
mesh must match the single-device solve (conftest provides the virtual
8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_cvd_tpu.config import PoseOptParams
from robust_cvd_tpu.parallel import mesh as pmesh
from robust_cvd_tpu.solver import pose_opt
from robust_cvd_tpu.solver.pose_opt import PoseOptInputs

from test_solver import make_scene


def _opt():
    return PoseOptParams(
        num_steps=2,
        ctf_long=4,
        ctf_short=3,
        lm_max_outer=10,
        lm_cg_iters=16,
        graduate_deformation_regularization=True,
    )


def test_sharded_solve_matches_single_device():
    opt = _opt()
    true, cfg, data = make_scene(num_frames=4, pts_per_pair=24)
    inputs = PoseOptInputs(
        data=data,
        median_depth=jnp.full((4,), 2.5),
        aspect=1.0,
        num_frames=4,
    )
    base = pose_opt.run(opt, inputs, focal=jnp.full((4,), 0.5))

    mesh = pmesh.make_mesh(8)
    sharded_inputs = pmesh.shard_pose_inputs(inputs, mesh)
    # padding: P rounded up to a device multiple with zero-weight rows
    P = int(data.pair.shape[0])
    Pp = int(sharded_inputs.data.pair.shape[0])
    assert Pp % 8 == 0 and Pp >= P
    assert float(jnp.sum(sharded_inputs.data.weight[P:])) == 0.0

    out = pose_opt.run(opt, sharded_inputs, focal=jnp.full((4,), 0.5))

    # Sum reordering across shards perturbs CG trajectories at float32
    # precision; solutions must agree to solver-accuracy tolerance.
    np.testing.assert_allclose(
        np.asarray(out.pose), np.asarray(base.pose), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.depth_grid), np.asarray(base.depth_grid), rtol=2e-2
    )


def test_shard_pose_inputs_layout():
    _, _, data = make_scene(num_frames=4, pts_per_pair=8)
    inputs = PoseOptInputs(
        data=data, median_depth=jnp.full((4,), 2.0), aspect=1.0, num_frames=4
    )
    mesh = pmesh.make_mesh(8)
    sh = pmesh.shard_pose_inputs(inputs, mesh)
    # pair axis is sharded over the mesh, per-frame tensors replicated
    assert len(sh.data.loc0.sharding.device_set) == 8
    assert sh.data.loc0.sharding.is_equivalent_to(
        pmesh.batch_sharded(mesh), sh.data.loc0.ndim
    )
    assert sh.median_depth.sharding.is_fully_replicated


def test_infer_data_parallel_matches_single_device():
    """Mesh-sharded batched inference (the DataParallel equivalent,
    reference midas_v2_model.py:35-37) must reproduce the single-device
    forward, including the ragged-batch pad/slice path."""
    import jax

    from robust_cvd_tpu.models.midas import MidasNet, normalize_images

    net = MidasNet(features=16, backbone_layers=(1, 1, 1, 1))
    x = np.random.default_rng(0).uniform(0, 1, (11, 32, 32, 3)).astype(
        np.float32
    )  # 11 % 8 != 0 exercises padding
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    def apply_fn(v, xx):
        return net.apply(v, normalize_images(xx))

    want = np.asarray(apply_fn(variables, jnp.asarray(x)))
    mesh = pmesh.make_mesh(8)
    got = np.asarray(
        pmesh.infer_data_parallel(apply_fn, variables, jnp.asarray(x), mesh)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)  # bf16 path

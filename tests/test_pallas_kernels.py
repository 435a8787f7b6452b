import jax.numpy as jnp
import numpy as np

from robust_cvd_tpu.ops import pallas_kernels as pk
from robust_cvd_tpu.solver.constraints import corner_min_eigenval as jnp_impl


def test_fused_corner_matches_jnp_interpret():
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 1, (2, 24, 128)), jnp.float32)
    want = np.asarray(jnp_impl(gray))
    got = np.asarray(pk.corner_min_eigenval_fused(gray, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dispatch_falls_back_on_cpu():
    rng = np.random.default_rng(1)
    gray = jnp.asarray(rng.uniform(0, 1, (1, 16, 128)), jnp.float32)
    out = pk.corner_min_eigenval(gray)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp_impl(gray)), atol=1e-4)

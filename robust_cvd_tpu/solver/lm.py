"""Matrix-free Levenberg-Marquardt with IRLS robustification (pure JAX).

TPU-native replacement for the reference's Ceres solve
(lib/PoseOptimizer.cpp:954-962: SPARSE_NORMAL_CHOLESKY, CauchyLoss,
DynamicAutoDiffCostFunction over 12 CPU threads). Instead of assembling a
sparse Jacobian and factorizing on the host, we:

  - evaluate ALL residuals as one batched tensor program (residuals.py),
  - robustify with frozen IRLS weights per outer iteration
    (Cauchy rho'(s) = 1/(1 + s/a^2), the standard IRLS view of CauchyLoss),
  - solve the damped normal equations (J^T J + lam*I) dx = -J^T r
    matrix-free with conjugate gradients, where J v and J^T u are one
    jvp / vjp through the residual function — no Jacobian is ever stored,
  - run the whole outer loop as a single jitted lax.while_loop on-device.

The parameter count here is tiny (~20k for a 100-frame clip) and every
CG matvec is a fused elementwise+gather program, so one LM solve is
microseconds-per-iteration on a TPU core vs. seconds on 12 CPU threads.

Masking (`fix_poses` etc., reference lib/PoseOptimizer.cpp:915-948) is a 0/1
vector applied inside the CG operator, which restricts the system to free
parameters. Lower bounds (scale >= 0 during depth normalization, reference
lib/PoseOptimizer.cpp:1105-1115) are enforced by projection after each
accepted step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class LMConfig(NamedTuple):
    max_outer: int = 50
    cg_iters: int = 64
    lam_init: float = 1e-3
    lam_up: float = 4.0
    lam_down: float = 0.5
    lam_min: float = 1e-9
    lam_max: float = 1e8
    rtol: float = 1e-8
    # IRLS robustness scale (Cauchy a); <= 0 disables robustification.
    robustness: float = 0.5


class LMResult(NamedTuple):
    params: object
    cost: jnp.ndarray
    iterations: jnp.ndarray
    lam: jnp.ndarray


def _cg(matvec: Callable, b: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Plain conjugate gradients, fixed iteration count (jit-friendly)."""
    x0 = jnp.zeros_like(b)

    def body(_, state):
        x, r, p, rs = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = jnp.where(denom > 0, rs / jnp.maximum(denom, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    r0 = b - matvec(x0)
    state = (x0, r0, r0, jnp.vdot(r0, r0))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@partial(
    jax.jit,
    static_argnames=("weighted_residual_fn", "robust_residual_fn", "project_fn", "cfg"),
)
def solve(
    weighted_residual_fn: Callable,
    robust_residual_fn: Callable | None,
    params0,
    mask,
    cfg: LMConfig,
    aux=None,
    project_fn: Callable | None = None,
):
    """Minimize 0.5 * || weighted_residual_fn(params, irls_w, aux) ||^2.

    weighted_residual_fn(params, irls_w, aux) -> flat residual vector; it
      must already fold `irls_w` (per-robust-block sqrt weights) into the
      robust blocks and fixed weights into everything else.
    robust_residual_fn(params, aux) -> (M, d) raw robust-block residuals used
      to recompute IRLS weights between outer iterations (None: no
      robustification; irls_w is all-ones).
    params0: parameter pytree. mask: same-structure pytree of 0/1 floats.
    aux: arbitrary pytree of constraint data — passed through jit as a
      DYNAMIC argument so large tensors are not baked into the executable
      as constants.
    project_fn(params) -> params: optional feasibility projection.
    """
    x0, unravel = ravel_pytree(params0)
    m0, _ = ravel_pytree(mask)

    def res(x, w):
        return weighted_residual_fn(unravel(x), w, aux)

    if robust_residual_fn is None:

        def irls(x):
            return jnp.ones((1,), x0.dtype)

    else:
        a2 = cfg.robustness * cfg.robustness

        def irls(x):
            r = robust_residual_fn(unravel(x), aux)
            s = jnp.sum(r * r, axis=-1)
            return 1.0 / jnp.sqrt(1.0 + s / a2)

    def proj(x):
        if project_fn is None:
            return x
        flat, _ = ravel_pytree(project_fn(unravel(x)))
        return flat

    def cost_of(x, w):
        r = res(x, w)
        return 0.5 * jnp.vdot(r, r)

    def outer_body(state):
        x, lam, prev_cost, it, done = state
        w = jax.lax.stop_gradient(irls(x))

        # NOTE: jax.jvp/jax.vjp instead of jax.linearize + linear_transpose —
        # functionally identical, but linearize compiles pathologically
        # slowly on some TPU backends (70s vs <1s for a trivial function).
        def res_w(xx):
            return res(xx, w)

        r0, vjp_fn = jax.vjp(res_w, x)

        def JT(u):
            return vjp_fn(u)[0]

        def J(v):
            return jax.jvp(res_w, (x,), (v,))[1]

        cost = 0.5 * jnp.vdot(r0, r0)
        g = JT(r0) * m0

        def matvec(v):
            vm = v * m0
            return JT(J(vm)) * m0 + lam * v

        dx = _cg(matvec, -g, cfg.cg_iters)
        x_new = proj(x + dx * m0)
        new_cost = cost_of(x_new, w)

        accept = new_cost < cost
        x = jnp.where(accept, x_new, x)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * cfg.lam_down, cfg.lam_min),
            jnp.minimum(lam * cfg.lam_up, cfg.lam_max),
        )
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_and(accept, rel_decrease < cfg.rtol)
        return x, lam, jnp.where(accept, new_cost, cost), it + 1, done

    def outer_cond(state):
        _, _, _, it, done = state
        return jnp.logical_and(it < cfg.max_outer, jnp.logical_not(done))

    init_cost = cost_of(x0, jax.lax.stop_gradient(irls(x0)))
    state = (x0, jnp.asarray(cfg.lam_init, x0.dtype), init_cost, jnp.array(0), jnp.array(False))
    x, lam, cost, it, _ = jax.lax.while_loop(outer_cond, outer_body, state)
    return LMResult(params=unravel(x), cost=cost, iterations=it, lam=lam)


def make_mask(params, fix_poses=False, fix_focal=False, fix_depth=False, fix_spatial=False):
    """0/1 mask pytree matching SolverParams-like namedtuples."""
    return type(params)(
        pose=jnp.zeros_like(params.pose) if fix_poses else jnp.ones_like(params.pose),
        focal=jnp.zeros_like(params.focal) if fix_focal else jnp.ones_like(params.focal),
        depth_grid=jnp.zeros_like(params.depth_grid)
        if fix_depth
        else jnp.ones_like(params.depth_grid),
        spatial_grid=jnp.zeros_like(params.spatial_grid)
        if fix_spatial
        else jnp.ones_like(params.spatial_grid),
    )

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
  - run CHUNKS of outer iterations (LMConfig.chunk, default 10) as one
    jitted program each, looping on the host between chunks. A fully fused
    while-loop solver trips this backend's runtime watchdog when a single
    program runs for minutes; per-chunk programs bound the runtime while
    amortizing host-sync latency, and convergence bookkeeping is carried
    on-device.

The solver state is the parameter PYTREE itself — CG runs on tree algebra,
so there is no ravel/unravel closure to bust the jit cache; the same
residual function object (cached by the callers in pose_opt.py) hits the
same compiled executable across fine-tuning epochs.

Masking (`fix_poses` etc., reference lib/PoseOptimizer.cpp:915-948) is a 0/1
pytree applied inside the CG operator, which restricts the system to free
parameters. Lower bounds (scale >= 0 during depth normalization, reference
lib/PoseOptimizer.cpp:1105-1115) are enforced by projection after each step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


# Optional FLOP accounting for bench MFU reporting: set to a dict and every
# executed _lm_outer_chunk RECORDS its arguments (references only — no
# lowering, no compile, zero timed-path overhead; an eager version measured
# +1.2 s on the benched pose stage when one lowering leaked into the timed
# loop). Call flush_cost_tracker() AFTER timing to run the cost analyses.
# None (default) = zero overhead.
COST_TRACKER: dict | None = None
_COST_CACHE: dict = {}


def flush_cost_tracker() -> float:
    """Sum HLO flop counts for every chunk execution recorded since the
    tracker was set. Two caveats the consumer must carry: (a) XLA's
    cost_analysis counts while/fori loop BODIES ONCE — the outer fori is
    recovered exactly by multiplying with the static cfg.chunk trip count,
    but the inner CG while-loop stays counted once per outer, so the result
    is a LOWER BOUND with the CG cap (16-42x) as the dominant undercount;
    (b) converged chunks skip remaining outers at runtime via lax.cond."""
    if COST_TRACKER is None:
        return 0.0
    total = 0.0
    for fns, cfg, params, lam, mask, aux in COST_TRACKER.get("pending", []):
        key = (
            fns, cfg,
            tuple(
                (tuple(x.shape), str(x.dtype))
                for x in jax.tree.leaves((params, lam, mask, aux))
            ),
        )
        if key not in _COST_CACHE:
            try:
                cost = (
                    _lm_outer_chunk.lower(*fns[:3], cfg, params, lam, mask,
                                          aux, diag_fn=fns[3])
                    .compile()
                    .cost_analysis()
                )
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                _COST_CACHE[key] = float(cost.get("flops", 0.0)) * cfg.chunk
            except Exception:  # best-effort, never fail the report
                _COST_CACHE[key] = 0.0
        total += _COST_CACHE[key]
    COST_TRACKER["pending"] = []
    return total


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
    # outer iterations fused into one jitted program (host syncs between
    # chunks only; a chunk stays well under the runtime watchdog)
    chunk: int = 10
    # Jacobi-preconditioned CG: estimate diag(J^T J) with `precond_probes`
    # Rademacher matvec probes per outer iteration and run PCG with
    # M = diag + lam (the pose/focal/grid parameter families have wildly
    # different curvatures, exactly the regime where Jacobi pays). 0 = off
    # (plain CG, the default until the cap retune is validated on-TPU).
    precond_probes: int = 0


class LMResult(NamedTuple):
    params: object
    cost: jnp.ndarray
    iterations: int
    lam: jnp.ndarray


# -- pytree vector algebra ---------------------------------------------------


def _tdot(a, b):
    leaves = jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree.reduce(lambda x, y: x + y, leaves, jnp.asarray(0.0))


def _taxpy(alpha, x, y):
    """alpha * x + y."""
    return jax.tree.map(lambda a, b: alpha * a + b, x, y)


def _tscale(alpha, x):
    return jax.tree.map(lambda a: alpha * a, x)


def _tmul(a, b):
    return jax.tree.map(jnp.multiply, a, b)


def _cg(matvec: Callable, b, iters: int, rtol: float = 0.01, minv=None):
    """(Preconditioned) conjugate gradients on pytrees with an
    inexact-Newton stopping rule: stop when ||r|| < rtol * ||b||
    (Steihaug-style forcing, the same idea as Ceres' inexact step) or
    after `iters` iterations. `minv` is an optional elementwise inverse
    preconditioner pytree (M^{-1} = 1/diag); the stopping rule stays on
    the TRUE residual norm so plain and preconditioned runs are
    comparable. Returns (x, iterations_used)."""
    x0 = jax.tree.map(jnp.zeros_like, b)
    b2 = _tdot(b, b)
    tol2 = (rtol * rtol) * b2

    def apply_minv(r):
        if minv is None:
            return r
        if callable(minv):
            return minv(r)
        return _tmul(r, minv)

    z0 = apply_minv(b)

    def cond(state):
        _, _, _, _, r2, it = state
        return jnp.logical_and(it < iters, r2 > tol2)

    def body(state):
        x, r, p, rz, _, it = state
        Ap = matvec(p)
        denom = _tdot(p, Ap)
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, 1e-30), 0.0)
        x = _taxpy(alpha, p, x)
        r = _taxpy(-alpha, Ap, r)
        z = apply_minv(r)
        rz_new = _tdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = _taxpy(beta, p, z)
        return x, r, p, rz_new, _tdot(r, r), it + 1

    state = (x0, b, z0, _tdot(b, z0), b2, jnp.array(0))
    x, _, _, _, _, it = jax.lax.while_loop(cond, body, state)
    return x, it


def _diag_estimate(matvec: Callable, template, key, probes: int):
    """Hutchinson estimate of the matvec operator's diagonal with
    Rademacher probes: diag ≈ E[(A z) ⊙ z], z ∈ {±1}. Clipped to a
    positive floor so the inverse preconditioner stays well-defined for
    parameters the problem barely touches."""
    leaves, treedef = jax.tree.flatten(template)
    keys = jax.random.split(key, probes)

    def one(k):
        ks = jax.random.split(k, len(leaves))
        z = jax.tree.unflatten(
            treedef,
            [
                jax.random.rademacher(kk, l.shape, l.dtype)
                for kk, l in zip(ks, leaves)
            ],
        )
        return _tmul(matvec(z), z)

    acc = one(keys[0])
    for k in keys[1:]:
        acc = _taxpy(1.0, one(k), acc)
    d = _tscale(1.0 / probes, acc)
    # positive floor relative to the mean diagonal magnitude
    total = jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), d), 0.0
    )
    count = jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda x: x.size, d), 0
    )
    floor = 1e-6 * total / count + 1e-30
    return jax.tree.map(lambda x: jnp.maximum(jnp.abs(x), floor), d)


def _one_outer_step(
    weighted_residual_fn, robust_residual_fn, project_fn, cfg, params, lam,
    mask, aux, diag_fn=None,
):
    """One LM outer iteration: frozen IRLS weights, CG on the damped normal
    equations, trial step with accept/reject and lambda update."""

    if robust_residual_fn is None:
        w = jnp.ones((1,), jnp.float32)
    else:
        a2 = cfg.robustness * cfg.robustness
        r = robust_residual_fn(params, aux)
        s = jnp.sum(r * r, axis=-1)
        w = jax.lax.stop_gradient(1.0 / jnp.sqrt(1.0 + s / a2))

    # NOTE: jax.jvp/jax.vjp instead of jax.linearize + linear_transpose —
    # functionally identical, but linearize compiles pathologically slowly
    # on some TPU backends (70s vs <1s for a trivial function).
    def res_w(p):
        return weighted_residual_fn(p, w, aux)

    r0, vjp_fn = jax.vjp(res_w, params)

    def JT(u):
        return vjp_fn(u)[0]

    def J(v):
        return jax.jvp(res_w, (params,), (v,))[1]

    cost = 0.5 * jnp.vdot(r0, r0)
    g = _tmul(JT(r0), mask)

    def matvec(v):
        vm = _tmul(v, mask)
        return _taxpy(lam, v, _tmul(JT(J(vm)), mask))

    minv = None
    if diag_fn is not None:
        # exact diag(J^T J) from the residual structure (residuals.py
        # build_diag_fn); masked params contribute only the damping term,
        # matching matvec's lam*v behavior there.
        d = diag_fn(params, w, aux)
        # exact-type check: the plain diag tree is a NamedTuple (also a
        # tuple subclass); only a BARE 2-tuple signals (diag, pose_blocks)
        if type(d) is tuple:
            # BLOCK-Jacobi: diag_fn was built with pose_blocks=True and also
            # returns the exact per-frame 6x6 pose blocks of J^T J. The
            # preconditioner solves the damped masked block per frame for the
            # pose rows (measured on the real pose problem: 22-37 CG
            # iterations vs 62 for the plain diagonal, from 163
            # unpreconditioned — PERF.md) and stays elementwise everywhere
            # else. Requires params with a `.pose` (N, 6) field.
            d, blocks = d
            mp = mask.pose
            bm = (
                blocks * mp[:, :, None] * mp[:, None, :]
                + lam * jnp.eye(blocks.shape[-1], dtype=blocks.dtype)
            )
            binv = jnp.linalg.inv(bm)  # (N, 6, 6), PD: PSD blocks + lam*I
            elem = jax.tree.map(lambda dd, m: 1.0 / (dd * m + lam), d, mask)

            def minv(r, _binv=binv, _elem=elem):
                z = _tmul(r, _elem)
                return z._replace(
                    pose=jnp.einsum("nij,nj->ni", _binv, r.pose)
                )
        else:
            minv = jax.tree.map(
                lambda dd, m: 1.0 / (dd * m + lam), d, mask
            )
    elif cfg.precond_probes > 0:
        # decorrelate probe error across outer iterations: lam changes
        # every accepted/rejected step, so folding its bits into the key
        # gives fresh Rademacher probes per iteration at zero cost
        key = jax.random.fold_in(
            jax.random.PRNGKey(17),
            jax.lax.bitcast_convert_type(lam, jnp.int32),
        )
        d = _diag_estimate(matvec, params, key, cfg.precond_probes)
        minv = jax.tree.map(lambda x: 1.0 / x, d)
    dx, _ = _cg(matvec, _tscale(-1.0, g), cfg.cg_iters, minv=minv)
    trial = jax.tree.map(lambda p, d, m: p + d * m, params, dx, mask)
    if project_fn is not None:
        trial = project_fn(trial)
    r_new = res_w(trial)
    new_cost = 0.5 * jnp.vdot(r_new, r_new)

    accept = new_cost < cost
    out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), trial, params)
    lam_out = jnp.where(
        accept,
        jnp.maximum(lam * cfg.lam_down, cfg.lam_min),
        jnp.minimum(lam * cfg.lam_up, cfg.lam_max),
    )
    rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-30)
    return out, lam_out, jnp.where(accept, new_cost, cost), accept, rel_decrease


@partial(
    jax.jit,
    static_argnames=(
        "weighted_residual_fn",
        "robust_residual_fn",
        "project_fn",
        "cfg",
        "diag_fn",
    ),
)
def _lm_outer_chunk(
    weighted_residual_fn,
    robust_residual_fn,
    project_fn,
    cfg: LMConfig,
    params,
    lam,
    mask,
    aux,
    diag_fn=None,
):
    """`cfg.chunk` LM outer iterations fused into one program, with the
    convergence bookkeeping carried on-device (host syncs between chunks)."""

    def body(state):
        params, lam, rejects, done, cost = state
        params, lam, cost, accept, rel = _one_outer_step(
            weighted_residual_fn, robust_residual_fn, project_fn, cfg,
            params, lam, mask, aux, diag_fn,
        )
        converged = jnp.logical_and(accept, rel < cfg.rtol)
        rejects = jnp.where(accept, 0, rejects + 1)
        stuck = jnp.logical_and(rejects >= 3, lam >= cfg.lam_max)
        return params, lam, rejects, jnp.logical_or(converged, stuck), cost

    def step(_, state):
        return jax.lax.cond(state[3], lambda s: s, body, state)

    state = (params, lam, jnp.array(0), jnp.array(False), jnp.asarray(jnp.inf))
    return jax.lax.fori_loop(0, cfg.chunk, step, state)


def solve(
    weighted_residual_fn: Callable,
    robust_residual_fn: Callable | None,
    params0,
    mask,
    cfg: LMConfig,
    aux=None,
    project_fn: Callable | None = None,
    diag_fn: Callable | None = None,
) -> LMResult:
    """Minimize 0.5 * || weighted_residual_fn(params, irls_w, aux) ||^2.

    weighted_residual_fn(params, irls_w, aux) -> flat residual vector; it
      must already fold `irls_w` (per-robust-block sqrt weights) into the
      robust blocks and fixed weights into everything else.
    robust_residual_fn(params, aux) -> (M, d) raw robust-block residuals used
      to recompute IRLS weights between outer iterations (None: no
      robustification; irls_w is all-ones).
    params0 / mask: parameter pytree and same-structure 0/1 float pytree.
    aux: pytree of constraint data — a DYNAMIC jit argument, so large
      tensors are never baked into executables as constants.
    project_fn(params) -> params: optional feasibility projection.

    NOTE: pass the SAME function objects across calls (pose_opt.py caches
    its factories) so the per-step jit cache is reused.
    """
    params = params0
    lam = jnp.asarray(cfg.lam_init, jnp.float32)
    cost = jnp.asarray(jnp.inf)
    it = 0
    chunks = max(1, -(-cfg.max_outer // cfg.chunk))
    for c in range(chunks):
        params, lam, _rejects, done, cost = _lm_outer_chunk(
            weighted_residual_fn, robust_residual_fn, project_fn, cfg,
            params, lam, mask, aux, diag_fn,
        )
        if COST_TRACKER is not None:
            COST_TRACKER.setdefault("pending", []).append((
                (weighted_residual_fn, robust_residual_fn, project_fn, diag_fn),
                cfg, params, lam, mask, aux,
            ))
        it = (c + 1) * cfg.chunk
        if bool(done):
            break
    return LMResult(params=params, cost=cost, iterations=it, lam=lam)


def make_mask(params, fix_poses=False, fix_focal=False, fix_depth=False, fix_spatial=False):
    """0/1 mask pytree matching SolverParams-like namedtuples."""
    shift = getattr(params, "depth_shift", None)
    return type(params)(
        pose=jnp.zeros_like(params.pose) if fix_poses else jnp.ones_like(params.pose),
        focal=jnp.zeros_like(params.focal) if fix_focal else jnp.ones_like(params.focal),
        depth_grid=jnp.zeros_like(params.depth_grid)
        if fix_depth
        else jnp.ones_like(params.depth_grid),
        spatial_grid=jnp.zeros_like(params.spatial_grid)
        if fix_spatial
        else jnp.ones_like(params.spatial_grid),
        depth_shift=None
        if shift is None
        else (jnp.zeros_like(shift) if fix_depth else jnp.ones_like(shift)),
    )

"""Camera model: extrinsics, intrinsics, and rotation utilities (pure JAX).

Conventions (parity with the reference, lib/DepthPhoto.h:20-112):
  - Right-handed coordinates; camera looks down **-Z**, up is +Y.
  - Extrinsics = (position (3,), orientation quaternion (4,) as [x, y, z, w]),
    camera-to-world: p_world = position + R(q) @ p_cam.
  - Intrinsics = (vFov, hFov) stored as full field-of-view angles in radians;
    the solver parameterizes focal = tan(vFov / 2)
    (reference lib/PoseOptimizer.cpp:748-783).
  - The solver represents orientation in angle-axis form of the matrix
    [right | up | -forward] — i.e. the rotation with the front vector flipped
    so its determinant is +1 (same trick as the reference).

Everything here is jit/vmap-friendly: plain functions over arrays, batched
over a leading frame axis where noted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CameraState(NamedTuple):
    """Per-frame camera parameters for a whole clip (batched pytree).

    position:    (N, 3) world-space camera centers
    quaternion:  (N, 4) orientation as [x, y, z, w]
    vfov:        (N,)   vertical field of view (radians)
    hfov:        (N,)   horizontal field of view (radians)
    """

    position: jnp.ndarray
    quaternion: jnp.ndarray
    vfov: jnp.ndarray
    hfov: jnp.ndarray

    @staticmethod
    def default(num_frames: int, aspect: float, focal_long: float = 0.3461538376301239):
        """Default cameras at origin, identity orientation, iPhone-7 focal.

        `focal_long` is tan(fov/2) on the long image side
        (reference lib/PoseOptimizer.h:92-94).
        """
        v_focal = focal_long / aspect if aspect >= 1.0 else focal_long
        vfov = 2.0 * np.arctan(v_focal)
        hfov = 2.0 * np.arctan(v_focal * aspect)
        return CameraState(
            position=jnp.zeros((num_frames, 3), jnp.float32),
            quaternion=jnp.tile(
                jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), (num_frames, 1)
            ),
            vfov=jnp.full((num_frames,), vfov, jnp.float32),
            hfov=jnp.full((num_frames,), hfov, jnp.float32),
        )


# ---------------------------------------------------------------------------
# Quaternion / rotation-matrix / angle-axis conversions.
# All functions take unbatched arguments; vmap for batches.
# ---------------------------------------------------------------------------


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[x, y, z, w] quaternion -> 3x3 rotation matrix."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> [x, y, z, w] quaternion (branch-free)."""
    # Shepperd's method, computed as four candidates then selecting the one
    # seeded by the largest diagonal combination for numerical stability.
    m00, m11, m22 = m[0, 0], m[1, 1], m[2, 2]
    tr = m00 + m11 + m22

    def normed(q):
        return q / jnp.linalg.norm(q)

    qw = jnp.array(
        [m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1], 1.0 + tr]
    )
    qx = jnp.array(
        [1.0 + m00 - m11 - m22, m[0, 1] + m[1, 0], m[0, 2] + m[2, 0], m[2, 1] - m[1, 2]]
    )
    qy = jnp.array(
        [m[0, 1] + m[1, 0], 1.0 - m00 + m11 - m22, m[1, 2] + m[2, 1], m[0, 2] - m[2, 0]]
    )
    qz = jnp.array(
        [m[0, 2] + m[2, 0], m[1, 2] + m[2, 1], 1.0 - m00 - m11 + m22, m[1, 0] - m[0, 1]]
    )
    scores = jnp.array([tr, m00, m11, m22])
    idx = jnp.argmax(scores)
    q = jnp.stack([qw, qx, qy, qz])[idx]
    q = normed(q)
    # Canonical sign: w >= 0.
    return jnp.where(q[3] < 0, -q, q)


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (3,) -> rotation matrix via Rodrigues (safe at 0)."""
    theta2 = jnp.dot(aa, aa)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    axis = aa / theta
    c, s = jnp.cos(theta), jnp.sin(theta)
    K = jnp.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ]
    )
    # K @ K == outer(axis, axis) - I for a unit axis; using the closed form
    # avoids a matmul (which may run at reduced precision on TPU).
    KK = jnp.outer(axis, axis) - jnp.eye(3)
    R = jnp.eye(3) + s * K + (1.0 - c) * KK
    # Near-zero rotations: first-order expansion I + [aa]_x.
    K0 = jnp.array(
        [
            [0.0, -aa[2], aa[1]],
            [aa[2], 0.0, -aa[0]],
            [-aa[1], aa[0], 0.0],
        ]
    )
    return jnp.where(theta2 < 1e-16, jnp.eye(3) + K0, R)


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> angle-axis (3,), angle in [0, pi]."""
    q = matrix_to_quat(m)
    return quat_to_axis_angle(q)


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """[x, y, z, w] quaternion -> angle-axis (3,)."""
    q = jnp.where(q[3] < 0, -q, q)
    v = q[:3]
    sin_half = jnp.linalg.norm(v)
    cos_half = q[3]
    angle = 2.0 * jnp.arctan2(sin_half, cos_half)
    scale = jnp.where(sin_half > 1e-12, angle / jnp.maximum(sin_half, 1e-24), 2.0)
    return v * scale


def axis_angle_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (3,) -> [x, y, z, w] quaternion."""
    theta2 = jnp.dot(aa, aa)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    half = 0.5 * theta
    sinc_half = jnp.where(theta2 < 1e-16, 0.5, jnp.sin(half) / theta)
    return jnp.concatenate([aa * sinc_half, jnp.cos(half)[None]])


def rotate_point_axis_angle(aa: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate point(s) p (..., 3) by the angle-axis vector aa (3,).

    Uses the Rodrigues rotation formula directly (no matrix), matching
    ceres::AngleAxisRotatePoint semantics — fully differentiable at aa = 0.
    """
    theta2 = jnp.sum(aa * aa)
    theta = jnp.sqrt(theta2 + 1e-24)
    axis = aa / theta
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    d = jnp.sum(axis * p, axis=-1, keepdims=True)
    cross = jnp.cross(jnp.broadcast_to(axis, p.shape), p)
    rotated = c * p + s * cross + (1.0 - c) * d * axis
    # First-order fallback near zero: p + aa x p.
    small = p + jnp.cross(jnp.broadcast_to(aa, p.shape), p)
    return jnp.where(theta2 < 1e-16, small, rotated)


# ---------------------------------------------------------------------------
# Solver pose parameterization <-> camera state.
# The solver flips the camera's front vector to get a det=+1 matrix
# (reference lib/PoseOptimizer.cpp:764-781): columns [right, up, -front].
# Since front = R @ (0,0,-1), -front = R @ (0,0,1), i.e. the flipped matrix
# IS the orientation matrix R itself. The flip in the reference exists
# because they build the matrix from the basis vectors; R(q) already has
# det = +1, so pose angle-axis == angle-axis of R(q).
# ---------------------------------------------------------------------------


def camera_to_pose_params(cam: CameraState) -> tuple:
    """CameraState -> (pose (N, 6) [pos, angle-axis], focal (N,) tan(vFov/2))."""
    import jax

    aa = jax.vmap(lambda q: quat_to_axis_angle(q))(cam.quaternion)
    pose = jnp.concatenate([cam.position, aa], axis=-1)
    focal = jnp.tan(cam.vfov / 2.0)
    return pose, focal


def pose_params_to_camera(pose: jnp.ndarray, focal: jnp.ndarray, aspect: float) -> CameraState:
    """(pose (N, 6), focal (N,)) -> CameraState with refreshed FOVs."""
    import jax

    quat = jax.vmap(axis_angle_to_quat)(pose[:, 3:6])
    vfov = 2.0 * jnp.arctan(focal)
    hfov = 2.0 * jnp.arctan(focal * aspect)
    return CameraState(position=pose[:, :3], quaternion=quat, vfov=vfov, hfov=hfov)


def world_to_camera_matrix(position: jnp.ndarray, quaternion: jnp.ndarray) -> jnp.ndarray:
    """4x4 world->camera ('modelview') matrix (lib/DepthPhoto.cpp:63-80)."""
    R = quat_to_matrix(quaternion)
    M = jnp.eye(4)
    M = M.at[:3, :3].set(R.T)
    M = M.at[:3, 3].set(-R.T @ position)
    return M

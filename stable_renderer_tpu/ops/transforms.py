"""Camera / transform math as pure jnp — replaces PyGLM + the GL Runtime UBO.

The reference keeps MVP/MV/IT matrices in a std140 uniform buffer updated per draw
(reference: engine/managers/runtimeManager.py:46-101, engine/runtime/components/
transform.py:9-393, camera.py:14-130). Here they are plain (4,4) arrays produced on
host or inside jit; conventions match OpenGL (right-handed view space, camera looks
down -Z, clip z in [-1, 1]) so the G-buffer semantics carry over unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def perspective(fov_y_deg: float | jax.Array, aspect: float, near: float, far: float) -> jax.Array:
    """GL-style perspective projection matrix (column-action: proj @ v)."""
    f = 1.0 / jnp.tan(jnp.deg2rad(fov_y_deg) / 2.0)
    return jnp.array(
        [
            [f / aspect, 0.0, 0.0, 0.0],
            [0.0, f, 0.0, 0.0],
            [0.0, 0.0, (far + near) / (near - far), 2.0 * far * near / (near - far)],
            [0.0, 0.0, -1.0, 0.0],
        ],
        jnp.float32,
    )


def orthographic(size: float, aspect: float, near: float, far: float) -> jax.Array:
    """GL orthographic projection; ``size`` = half vertical extent."""
    t, b = size, -size
    r, l = size * aspect, -size * aspect
    return jnp.array(
        [
            [2.0 / (r - l), 0, 0, -(r + l) / (r - l)],
            [0, 2.0 / (t - b), 0, -(t + b) / (t - b)],
            [0, 0, -2.0 / (far - near), -(far + near) / (far - near)],
            [0, 0, 0, 1.0],
        ],
        jnp.float32,
    )


def look_at(eye: jax.Array, center: jax.Array, up: jax.Array) -> jax.Array:
    """GL lookAt view matrix."""
    eye, center, up = (jnp.asarray(a, jnp.float32) for a in (eye, center, up))
    f = center - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(s).at[1, :3].set(u).at[2, :3].set(-f)
    m = m.at[0, 3].set(-jnp.dot(s, eye)).at[1, 3].set(-jnp.dot(u, eye)).at[2, 3].set(jnp.dot(f, eye))
    return m


def translate(t: jax.Array) -> jax.Array:
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.asarray(t, jnp.float32))


def scale(s: jax.Array) -> jax.Array:
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones(1, jnp.float32)]))


def quat_from_euler(euler_xyz_deg: jax.Array) -> jax.Array:
    """(x, y, z) intrinsic Tait-Bryan angles in degrees -> quaternion (w, x, y, z)."""
    rx, ry, rz = jnp.deg2rad(jnp.asarray(euler_xyz_deg, jnp.float32)) / 2.0
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    return jnp.array(
        [
            cx * cy * cz + sx * sy * sz,
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
        ],
        jnp.float32,
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (..., 3) by quaternion q (w, x, y, z)."""
    w, xyz = q[0], q[1:]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    w, x, y, z = q / jnp.linalg.norm(q)
    m = jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y), 0],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x), 0],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y), 0],
            [0, 0, 0, 1],
        ],
        jnp.float32,
    )
    return m


def trs(translation: jax.Array, rotation_quat: jax.Array, scaling: jax.Array) -> jax.Array:
    """Compose a model matrix = T @ R @ S (the reference Transform's convention)."""
    return translate(translation) @ quat_to_matrix(rotation_quat) @ scale(scaling)


def normal_matrix(model_view: jax.Array) -> jax.Array:
    """Inverse-transpose of the upper-left 3x3: transforms normals to view space
    (the MV_IT of the reference's Runtime UBO)."""
    return jnp.linalg.inv(model_view[:3, :3]).T


def transform_points(m: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a (4,4) matrix to (..., 3) points, returning (..., 3) (w-divide)."""
    p4 = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = p4 @ m.T
    return out[..., :3] / out[..., 3:4]


def transform_dirs(m: jax.Array, dirs: jax.Array) -> jax.Array:
    """Apply the rotation part of a (4,4) matrix to (..., 3) directions."""
    return dirs @ m[:3, :3].T

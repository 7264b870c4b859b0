"""Quaternion / rotation / map-transform utilities.

Semantics match the reference `src/core/utils.py` (build_rotation, covariance
builders, compute_rot, transform_map, compute_incident_angle,
compute_confidence) in pure batched jnp.

Quaternions are (w, x, y, z) as in 3DGS / the reference.
"""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Matches reference `src/core/utils.py:69-92` (normalizes first).
    """
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(norm, 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1),
            jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1),
            jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return R


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s)  (reference `src/core/utils.py:95-104`)."""
    R = build_rotation(q)
    return R * s[..., None, :]


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular 6-vector of a (..., 3, 3) symmetric matrix."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2], cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def covariance_from_scaling_rotation(scaling, scaling_modifier, rotation):
    """Sym 6-vector covariance (reference `src/core/utils.py:107-111`)."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    cov = L @ jnp.swapaxes(L, -2, -1)
    return strip_symmetric(cov)


def quaternion_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3), (..., 1) -> (..., 4) wxyz (reference `utils.py:114-120`)."""
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def compute_rot(init_vec: jnp.ndarray, target_vec: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating init_vec -> target_vec (reference `utils.py:122-127`).

    Used to build a surfel's orientation from its normal (init = +z axis).
    Both inputs (..., 3); unit-ish vectors expected.
    """
    axis = jnp.cross(init_vec, target_vec)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    dot = jnp.clip(jnp.sum(init_vec * target_vec, axis=-1), -1.0 + 1e-7, 1.0 - 1e-7)
    angle = jnp.arccos(dot)[..., None]
    return quaternion_from_axis_angle(axis, angle)


def build_rotation_t(q: jnp.ndarray) -> jnp.ndarray:
    """Transposed-layout `build_rotation`: (4, N) wxyz -> (3, 3, N).

    Componentwise on (N,) rows so every op runs at full TPU lane width
    (a (N, 4) quaternion chain uses 4 of 128 lanes; see the SoA layout note
    in `core.surfels`).
    """
    r, x, y, z = q[0], q[1], q[2], q[3]
    inv = 1.0 / jnp.sqrt(r * r + x * x + y * y + z * z + 1e-24)
    r, x, y, z = r * inv, x * inv, y * inv, z * inv
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)]),
            jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)]),
            jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)]),
        ]
    )


def normal_from_quat_t(q: jnp.ndarray) -> jnp.ndarray:
    """Third column of R(q) for (4, N) quaternions -> unit (3, N).

    The surfel normal is the min-scale (always 3rd, see
    `core.surfels.SurfelMap.get_normal`) rotation column; computing just that
    column skips 2/3 of `build_rotation_t`.
    """
    r, x, y, z = q[0], q[1], q[2], q[3]
    inv = 1.0 / jnp.sqrt(r * r + x * x + y * y + z * z + 1e-24)
    r, x, y, z = r * inv, x * inv, y * inv, z * inv
    nx = 2 * (x * z + r * y)
    ny = 2 * (y * z - r * x)
    nz = 1 - 2 * (x * x + y * y)
    inv_n = 1.0 / (jnp.sqrt(nx * nx + ny * ny + nz * nz) + 1e-8)
    return jnp.stack([nx * inv_n, ny * inv_n, nz * inv_n])


def rot_z_to_t(target: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating +z onto each column of `target` (3, N) -> (4, N).

    Transposed-layout specialization of `compute_rot` with init = +z:
    cross(z, n) = (-ny, nx, 0), dot = nz.
    """
    nx, ny, nz = target[0], target[1], target[2]
    ax, ay = -ny, nx
    inv = 1.0 / (jnp.sqrt(ax * ax + ay * ay) + 1e-8)
    ax, ay = ax * inv, ay * inv
    dot = jnp.clip(nz, -1.0 + 1e-7, 1.0 - 1e-7)
    half = jnp.arccos(dot) * 0.5
    s = jnp.sin(half)
    return jnp.stack([jnp.cos(half), ax * s, ay * s, jnp.zeros_like(s)])


def transform_map(points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform to an (H, W, 3) map (reference `utils.py:129-133`)."""
    return points @ R.T + t


def compute_incident_angle(normal_map: jnp.ndarray, intr) -> jnp.ndarray:
    """|cos| between per-pixel viewing ray and normal, (H, W, 1).

    Reference `src/core/utils.py:135-145`. Note the reference returns the
    ABSOLUTE cosine similarity (named 'angle' loosely); a grazing view has a
    value near 0 which the caller compares against sin(threshold)
    (`system.py:97-98`).
    """
    H, W = normal_map.shape[:2]
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=normal_map.dtype), jnp.arange(W, dtype=normal_map.dtype), indexing="ij")
    proj = jnp.stack([(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], axis=-1)
    proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-8)
    nrm = normal_map / (jnp.linalg.norm(normal_map, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.abs(jnp.sum(nrm * proj, axis=-1))
    return cos[..., None]


def compute_confidence(coords: jnp.ndarray, center: jnp.ndarray, max_radius: float, two_sigma_2: float) -> jnp.ndarray:
    """Radial Gaussian confidence map (reference `utils.py:147-150`)."""
    radial = jnp.linalg.norm(coords - center, axis=-1) / max_radius
    return jnp.exp(-(radial**2) / two_sigma_2)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)

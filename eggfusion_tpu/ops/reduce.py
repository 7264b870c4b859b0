"""Dense-tracking normal-equation builders (projective warp + ICP + photometric).

TPU-native equivalent of the reference's tracking math:
  projective_warp  <- `src/core/optimizer.py:130-182` (+ CUDA twin
                      `tracking.cu:133-218`)
  icp_terms        <- `src/core/optimizer.py:327-387` point-to-plane ICP
  rgb_terms        <- `src/core/optimizer.py:278-325` photometric term
  solve_gn         <- `tracking.cu:929-950` (Eigen colPivHouseholderQr with
                      +lm*I damping; here a 6x6 `jnp.linalg.solve` on device —
                      no GPU->CPU->GPU round-trip like the reference)

Design: instead of materializing per-pixel 27-float JtJ/Jtr blocks and
reducing (what the reference's dead `reduce.cu` sketches), we build the
masked Jacobian J (HW, 6) and residual r (HW,) and let the MXU compute
H = (w*J)^T J and g = (w*J)^T r as 6xHW matmuls — the fused reduction the
CUDA version never finished, expressed the XLA way.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from eggfusion_tpu.ops import image as imops
from eggfusion_tpu.ops.pyramid import PyramidLevel


def projective_warp(transform: jnp.ndarray, disp: jnp.ndarray, intr: jnp.ndarray):
    """Dense projective warp + 2x6 SE(3) Jacobian.

    Matches `projective_transform` (`optimizer.py:130-182`): pixels are lifted
    to normalized homogeneous-with-inverse-depth 4-vectors [u, v, 1, d],
    multiplied by T^T, perspective-divided, and mapped to [-1, 1] grid coords.

    Returns (warped_grid (H, W, 2) in [-1, 1], dxdxi (H, W, 2, 6)).
    """
    d = disp[..., 0] if disp.ndim == 3 else disp
    H, W = d.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=d.dtype), jnp.arange(W, dtype=d.dtype), indexing="ij"
    )
    us = (xs - cx) / fx
    vs = (ys - cy) / fy
    ones = jnp.ones_like(us)
    Ps = jnp.stack([us, vs, ones, d], axis=-1)  # (H, W, 4)
    Pt = Ps @ transform.T
    ut = Pt[..., 0] / Pt[..., 2]
    vt = Pt[..., 1] / Pt[..., 2]
    dt = Pt[..., 3] / Pt[..., 2]

    O = jnp.zeros_like(ut)
    dxdxi = jnp.stack(
        [
            dt * fx, O, -ut * dt * fx, -ut * vt * fx, (1 + ut * ut) * fx, -vt * fx,
            O, dt * fy, -vt * dt * fy, -(1 + vt * vt) * fy, ut * vt * fy, ut * fy,
        ],
        axis=-1,
    ).reshape(H, W, 2, 6)

    wx = 2.0 * (fx * ut + cx) / (W - 1) - 1.0
    wy = 2.0 * (fy * vt + cy) / (H - 1) - 1.0
    return jnp.stack([wx, wy], axis=-1), dxdxi


def _weighted_normal_eq(J: jnp.ndarray, r: jnp.ndarray, w: jnp.ndarray):
    """H = (wJ)^T J, g = (wJ)^T r, n = sum(w). J: (N, 6), r: (N,), w: (N,)."""
    Jw = J * w[:, None]
    H = Jw.T @ J  # 6xN @ Nx6 -> MXU
    g = Jw.T @ r
    return H, g, jnp.sum(w)


def icp_terms(
    model: PyramidLevel,
    frame: PyramidLevel,
    transform: jnp.ndarray,
    coords: jnp.ndarray,
    angle_thres_deg: float,
    dist_thres: float,
):
    """Point-to-plane ICP normal equations (reference `optimizer.py:327-387`).

    Gates (identical to the reference): grid bound 0.98, NaN normals, positive
    transformed depth, normal-angle sine < sin(angle_thres), distance <
    dist_thres, model & frame masks (frame mask taken at the ORIGINAL pixel,
    matching the reference's unsampled `mask_curr` quirk).
    """
    Hh, Ww = coords.shape[:2]
    vprev = (model.vertex.reshape(-1, 3) @ transform[:3, :3].T) + transform[:3, 3]
    nprev = model.normal.reshape(-1, 3) @ transform[:3, :3].T

    vcurr = imops.nearest_sample(frame.vertex, coords, padding="border").reshape(-1, 3)
    ncurr = imops.nearest_sample(frame.normal, coords, padding="border").reshape(-1, 3)

    delta_v = vcurr - vprev
    cross_n = jnp.cross(ncurr, nprev)
    dist = jnp.linalg.norm(delta_v, axis=-1)
    sine = jnp.linalg.norm(cross_n, axis=-1)

    bound = 0.98
    c = coords.reshape(-1, 2)
    inmask = (c[:, 0] > -bound) & (c[:, 0] < bound) & (c[:, 1] > -bound) & (c[:, 1] < bound)
    nan_mask = ~jnp.any(jnp.isnan(cross_n), axis=-1)
    pos_mask = vprev[:, 2] > 0
    valid = (sine < math.sin(angle_thres_deg * math.pi / 180.0)) & (dist < dist_thres)
    w = (
        inmask
        & nan_mask
        & pos_mask
        & valid
        & model.mask.reshape(-1)
        & frame.mask.reshape(-1)
    ).astype(coords.dtype)

    r = jnp.sum(ncurr * delta_v, axis=-1)
    J = jnp.concatenate([ncurr, jnp.cross(vprev, ncurr)], axis=-1)
    J = jnp.nan_to_num(J)
    r = jnp.nan_to_num(r)
    return _weighted_normal_eq(J, r, w)


def rgb_terms(model: PyramidLevel, frame: PyramidLevel, coords: jnp.ndarray, Jc: jnp.ndarray):
    """Photometric normal equations (reference `optimizer.py:278-325`).

    Gates: grid bound 0.90, frame gradient magnitude > 1 at the ORIGINAL pixel
    (reference quirk), model mask, warped frame mask (nearest, zeros) > 0.8.
    """
    bound = 0.90
    c = coords.reshape(-1, 2)
    inmask = (c[:, 0] > -bound) & (c[:, 0] < bound) & (c[:, 1] > -bound) & (c[:, 1] < bound)
    grad_mask = frame.grad[..., 2].reshape(-1) > 1.0
    mask_prev = model.mask.reshape(-1)

    sample_I = imops.bilinear_sample(frame.intensity, coords, padding="zeros")[..., 0]
    Ji = imops.bilinear_sample(frame.grad[..., :2], coords, padding="zeros")  # (H, W, 2)
    mask_curr = imops.nearest_sample(frame.mask.astype(coords.dtype), coords, padding="zeros")[..., 0] > 0.8

    w = (inmask & mask_prev & grad_mask & mask_curr.reshape(-1)).astype(coords.dtype)

    J = jnp.einsum("hwk,hwkj->hwj", Ji, Jc).reshape(-1, 6)
    r = (model.intensity[..., 0] - sample_I).reshape(-1)
    J = jnp.nan_to_num(J)
    r = jnp.nan_to_num(r)
    return _weighted_normal_eq(J, r, w)


def solve_gn(A: jnp.ndarray, b: jnp.ndarray, lm: float = 1.0e-6) -> jnp.ndarray:
    """Damped 6x6 solve: (A + lm*I) dx = b (reference `tracking.cu:929-950`).

    Stays on device — the reference round-trips to CPU Eigen per iteration.
    """
    A = A + lm * jnp.eye(A.shape[0], dtype=A.dtype)
    return jnp.linalg.solve(A, b.reshape(-1))


def build_normal_equations(
    model: PyramidLevel,
    frame: PyramidLevel,
    transform: jnp.ndarray,
    angle_thres_deg: float,
    dist_thres: float,
    use_rgb: bool,
    rgb_weight: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One GN build at one pyramid level: A (6, 6), b (6,), valid count.

    Mirrors `Tracker.tracking_optimization` (`tracker.py:194-238`).
    """
    coords, Jc = projective_warp(transform, model.disp, model.intr)
    A, b, n = icp_terms(model, frame, transform, coords, angle_thres_deg, dist_thres)
    if use_rgb:
        A_rgb, b_rgb, n_rgb = rgb_terms(model, frame, coords, Jc)
        A = A + rgb_weight * A_rgb
        b = b + rgb_weight * b_rgb
        n = n + n_rgb
    return A, b, n

"""SE(3)/SO(3) Lie-group math in pure jnp.

Semantics match the reference `src/utils/camera_utils.py:9-68` (class Lie) but are
pure-functional, NaN-safe under autodiff (guarded `where` branches), and batched.

Conventions:
  * so3 vector `theta` is the rotation axis-angle (3,).
  * se3 vector `tau` = [theta(3), rho(3)] ordering as in the reference
    `se3_to_SE3` (`camera_utils.py:53-58`): tau.split -> (theta, rho).
  * The tracker's incremental update uses `update_transform` semantics from
    `src/core/optimizer.py:426-441`: dx = [dt(3), dw(3)];
    R <- exp(dw) @ R, t <- dt + t  (NOT a full SE(3) exponential).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def skew(x: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a (..., 3) vector -> (..., 3, 3)."""
    o = jnp.zeros_like(x[..., 0])
    return jnp.stack(
        [
            jnp.stack([o, -x[..., 2], x[..., 1]], axis=-1),
            jnp.stack([x[..., 2], o, -x[..., 0]], axis=-1),
            jnp.stack([-x[..., 1], x[..., 0], o], axis=-1),
        ],
        axis=-2,
    )


def _safe_angle(theta: jnp.ndarray):
    """(small, angle) with a gradient-safe norm: where the angle is tiny the
    norm is replaced by a constant BEFORE sqrt so d|x|/dx never produces
    NaN/inf through the untaken `where` branch (a real footgun the reference's
    torch.where formulation has under autograd)."""
    norm2 = jnp.sum(theta * theta, axis=-1)
    small = norm2 < 1e-10
    angle = jnp.sqrt(jnp.where(small, 1.0, norm2))
    return small[..., None, None], angle[..., None, None]


def so3_to_SO3(theta: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) via Rodrigues, (..., 3) -> (..., 3, 3)."""
    W = skew(theta)
    W2 = W @ W
    small, safe = _safe_angle(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    # Taylor for small angles: I + W + W^2/2
    taylor = I + W + 0.5 * W2
    exact = I + (jnp.sin(safe) / safe) * W + ((1.0 - jnp.cos(safe)) / (safe**2)) * W2
    return jnp.where(small, taylor, exact)


def SO3_to_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3), (..., 3, 3) -> (..., 3)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0 + _EPS, 1.0 - _EPS)
    theta = jnp.arccos(cos_t)
    small = theta < 1e-5
    safe = jnp.where(small, 1.0, theta)
    # exact: log(R) = theta / (2 sin theta) * (R - R^T), vee'd.
    # (The reference `SO3_to_so3` drops the theta factor — a latent bug in its
    # unused SE3 log path; we keep the mathematically correct form.)
    lnR = (theta / (2.0 * jnp.sin(safe)))[..., None, None] * (R - jnp.swapaxes(R, -2, -1))
    w = jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)
    # Small-angle: log(R) ~ (R - R^T)/2 vee
    w_small = jnp.stack(
        [
            (R[..., 2, 1] - R[..., 1, 2]) / 2.0,
            (R[..., 0, 2] - R[..., 2, 0]) / 2.0,
            (R[..., 1, 0] - R[..., 0, 1]) / 2.0,
        ],
        axis=-1,
    )
    return jnp.where(small[..., None], w_small, w)


def V_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """Left-Jacobian V of SO(3) (reference `camera_utils.py:40-51`)."""
    W = skew(theta)
    W2 = W @ W
    small, safe = _safe_angle(theta)
    I = jnp.broadcast_to(jnp.eye(3, dtype=theta.dtype), W.shape)
    taylor = I + 0.5 * W + (1.0 / 6.0) * W2
    exact = I + ((1.0 - jnp.cos(safe)) / safe**2) * W + ((safe - jnp.sin(safe)) / safe**3) * W2
    return jnp.where(small, taylor, exact)


def se3_to_SE3(tau: jnp.ndarray) -> jnp.ndarray:
    """se(3) -> SE(3): tau = [theta(3), rho(3)] -> 4x4 (reference ordering)."""
    theta, rho = tau[..., :3], tau[..., 3:]
    R = so3_to_SO3(theta)
    t = (V_matrix(theta) @ rho[..., None])[..., 0]
    T = jnp.zeros(tau.shape[:-1] + (4, 4), dtype=tau.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def SE3_to_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) -> se(3): returns [rho(3), theta(3)] (reference `camera_utils.py:60-65`)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    theta = SO3_to_so3(R)
    Vinv = jnp.linalg.inv(V_matrix(theta))
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, theta], axis=-1)


def update_transform(transform: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Apply the tracker's 6-DoF increment (reference `optimizer.py:426-441`).

    dx = [dt(3), dw(3)]:  R <- exp(dw) @ R ;  t <- dt + t.
    Pure-functional (no aliasing, unlike the reference's in-place mutation).
    """
    dR = so3_to_SO3(dx[3:])
    T = transform
    T = T.at[:3, :3].set(dR @ transform[:3, :3])
    T = T.at[:3, 3].set(dx[:3] + transform[:3, 3])
    return T


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4 (avoids general linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -2, -1)
    ti = -(Rt @ t[..., None])[..., 0]
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out

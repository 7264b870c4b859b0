"""Image-pyramid construction for dense tracking.

TPU-native equivalent of the reference `PyraImageCUDA`
(`/root/reference/src/utils/frame.py:22-109`): an N-level pyramid of
  intensity, disparity (1/depth), Scharr gradients (gx, gy, |g|),
  validity mask, vertex map, normal map, per-level intrinsics.

Design differences from the reference (TPU-first):
  * The pyramid is a tuple of per-level `PyramidLevel` NamedTuples — a pytree,
    so the whole build is one jit-compiled XLA program and the result feeds
    straight into the jitted tracker.
  * Levels have static shapes (floor(H/2**l)); intrinsics are device arrays.

Parity notes (quirks preserved deliberately — see SURVEY.md §"quirks"):
  * Gray conversion applies BGR coefficients to RGB input
    (`frame.py:19,40`): gray = 0.114 R + 0.587 G + 0.299 B. Kept identical so
    photometric residuals match the reference numerically.
  * Deeper-level depth is re-bilateral-filtered with (13, 0.03, 4.5)
    (`frame.py:84`); masks threshold downsampled mask > 0.9 AND depth > 0.1
    (`frame.py:70,88`); vertex/normal pyramids are downsampled maps, not
    recomputed from depth (`frame.py:90-95`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from eggfusion_tpu.ops import image as imops

RGB_COEFF = (0.299, 0.587, 0.114)  # applied reversed, as in the reference


class PyramidLevel(NamedTuple):
    intensity: jnp.ndarray  # (H, W, 1)
    intr: jnp.ndarray  # (4,) fx, fy, cx, cy
    disp: jnp.ndarray  # (H, W, 1) inverse depth
    grad: jnp.ndarray  # (H, W, 3) gx, gy, |g|
    mask: jnp.ndarray  # (H, W, 1) bool
    vertex: jnp.ndarray  # (H, W, 3)
    normal: jnp.ndarray  # (H, W, 3)


Pyramid = Tuple[PyramidLevel, ...]


def _gray(color: jnp.ndarray) -> jnp.ndarray:
    """Reference-parity gray: BGR coefficients on an RGB image (`frame.py:40`)."""
    return (
        color[..., 0] * RGB_COEFF[2] + color[..., 1] * RGB_COEFF[1] + color[..., 2] * RGB_COEFF[0]
    )[..., None]


def _grad3(gray: jnp.ndarray) -> jnp.ndarray:
    gx, gy = imops.scharr_gradient(gray)
    mag = jnp.sqrt(gx**2 + gy**2 + 1e-6)
    return jnp.stack([gx, gy, mag], axis=-1)


@functools.partial(jax.jit, static_argnames=("nlevel", "bilateral"))
def build_pyramid(color: jnp.ndarray, depth: jnp.ndarray, mask: jnp.ndarray, intr: jnp.ndarray, nlevel: int = 3, bilateral: str = "exact") -> Pyramid:
    """Build an `nlevel` pyramid from (H, W, 3) color, (H, W, 1) depth,
    (H, W, 1) float mask and (4,) intrinsics. All on device, one XLA program.

    `bilateral` selects the per-level depth re-filter variant
    (System.bilateral_mode): "exact" = the reference's 13x13 window,
    "separable" = the standard row+column approximation (26 taps vs 169).
    """
    gray = _gray(color)
    vmap, nmap = imops.compute_vertex_and_normal(depth, intr)

    levels = []
    levels.append(
        PyramidLevel(
            intensity=gray,
            intr=intr,
            disp=1.0 / (depth + 1e-6),
            grad=_grad3(gray),
            mask=(mask > 0.9) & (depth > 0.1),
            vertex=vmap,
            normal=nmap,
        )
    )

    depth_l = depth
    mask_l = mask
    gray_l = gray
    vmap_l = vmap
    nmap_l = nmap
    for l in range(1, nlevel):
        gray_l = imops.gaussian_downsample(gray_l)
        depth_l = imops.gaussian_downsample(depth_l)
        bilat = (imops.bilateral_filter_separable if bilateral == "separable"
                 else imops.bilateral_filter)
        depth_l = bilat(depth_l, 13, 0.03, 4.5)
        mask_l = imops.gaussian_downsample(mask_l)
        vmap_l = imops.gaussian_downsample(vmap_l)
        nmap_l = imops.gaussian_downsample(nmap_l)
        nmap_l = nmap_l / (jnp.linalg.norm(nmap_l, axis=-1, keepdims=True) + 1e-12)
        levels.append(
            PyramidLevel(
                intensity=gray_l,
                intr=levels[-1].intr / 2.0,
                disp=1.0 / (depth_l + 1e-6),
                grad=_grad3(gray_l),
                mask=(mask_l > 0.9) & (depth_l > 0.1),
                vertex=vmap_l,
                normal=nmap_l,
            )
        )
    return tuple(levels)

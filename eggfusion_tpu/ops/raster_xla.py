"""Golden-reference differentiable surfel rasterizer in pure XLA.

Depth-sorted front-to-back alpha compositing over ALL pixels — O(N * H * W),
exact and autodiff-differentiable. This is the correctness oracle for the
Pallas tile renderer (`raster_pallas`) and the default path for small scenes
/ CPU tests. Interface contract = reference `Renderer.render`
(`/root/reference/src/core/render.py:53-104`): returns color, normal, depth,
opacity images.

Compositing is chunked: a `lax.scan` carries (rgb, normal, depth, opacity,
transmittance) across chunks while each chunk unrolls sequential over-blending
of its surfels — order within and across chunks follows the global depth sort
(a global sort induces the correct per-pixel order, the same invariant the
3DGS tile sorter relies on).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eggfusion_tpu.ops import raster_common as rc

CHUNK = 32


@functools.partial(jax.jit, static_argnames=("width", "height", "sh_degree", "chunk"))
def render_xla(params: dict, w2c: jnp.ndarray, intr: jnp.ndarray, width: int, height: int,
               sh_degree: int = 3, chunk: int = CHUNK) -> dict:
    """Render surfels to (H, W, *) color/normal/depth/opacity maps."""
    proj = rc.project_surfels(params, w2c, intr, width, height, sh_degree)
    N = proj.depth.shape[0]
    pad = (-N) % chunk
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))

    def take(x):
        x = x[order]
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        return x.reshape(-1, chunk, *x.shape[1:])

    # projection is transposed (k, N); this oracle path works in rows (its
    # cost is the O(N*H*W) blend, the transposes are noise)
    mean2d = take(proj.mean2d.T)
    conic = take(proj.conic.T)
    color = take(proj.color.T)
    normal = take(proj.normal_cam.T)
    p_cam = take(proj.p_cam.T)
    opacity = take(proj.opacity)
    radius = take(proj.radius)

    H, W = height, width
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # per-pixel camera ray (for surfel-plane depth)
    ray = jnp.stack([(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], axis=-1)

    init = (
        jnp.zeros((H, W, 3), jnp.float32),  # rgb
        jnp.zeros((H, W, 3), jnp.float32),  # normal
        jnp.zeros((H, W), jnp.float32),  # depth
        jnp.zeros((H, W), jnp.float32),  # opacity-weight accum (= 1 - T)
        jnp.ones((H, W), jnp.float32),  # transmittance
    )

    def chunk_step(carry, inputs):
        rgb, nrm, dep, opa, T = carry
        c_mean, c_conic, c_color, c_normal, c_pcam, c_op, c_rad = inputs
        for k in range(chunk):
            dx = xs - c_mean[k, 0]
            dy = ys - c_mean[k, 1]
            power = -0.5 * (c_conic[k, 0] * dx * dx + 2 * c_conic[k, 1] * dx * dy + c_conic[k, 2] * dy * dy)
            alpha = jnp.minimum(rc.MAX_ALPHA, c_op[k] * jnp.exp(power))
            alpha = jnp.where((alpha >= rc.ALPHA_EPS) & (c_rad[k] > 0), alpha, 0.0)
            w = T * alpha
            # geometry-aware depth: ray/plane intersection with the surfel disk
            denom = jnp.sum(ray * c_normal[k], axis=-1)
            z_plane = jnp.sum(c_pcam[k] * c_normal[k]) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
            z_px = jnp.where((z_plane > rc.NEAR_Z) & (jnp.abs(denom) >= 1e-6), z_plane, c_pcam[k, 2])
            rgb = rgb + w[..., None] * c_color[k]
            nrm = nrm + w[..., None] * c_normal[k]
            dep = dep + w * z_px
            opa = opa + w
            T = T * (1.0 - alpha)
        return (rgb, nrm, dep, opa, T), None

    chunk_step = jax.checkpoint(chunk_step)
    (rgb, nrm, dep, opa, T), _ = jax.lax.scan(
        chunk_step, init, (mean2d, conic, color, normal, p_cam, opacity, radius)
    )

    # Normalize depth/normal by accumulated weight: un-normalized compositing
    # biases depth low by (1-T)*z, which would eat the reference's 1 cm
    # depth-consistency threshold (`system.py:63`, reco_depth_threshold).
    wsum = jnp.maximum(opa, 1e-6)
    dep = dep / wsum
    nrm = nrm / wsum[..., None]

    return {
        "color": rgb,  # (H, W, 3); background black (reference render.py:33)
        "normal": nrm,
        "depth": dep[..., None],
        "opacity": opa[..., None],
    }

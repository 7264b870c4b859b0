"""Image-processing kernels: the TPU-native equivalents of the reference's
`cuda_tracking_ext` (`/root/reference/src/utils/cuda/src/tracking.cu`).

All functions are pure jnp, jit-friendly (static shapes), and vectorize onto
the TPU VPU via XLA. The bilateral filter additionally has a Pallas path
(see `eggfusion_tpu.ops.pallas_image`) used on TPU for the large level-0 pass.

Correspondence to the reference kernels:
  vertex_from_depth / normal_from_vertex  <- compute_vertex_and_normal_cuda
                                             (`tracking.cu:602-702`)
  scharr_gradient                         <- compute_gradients_cuda
                                             (`tracking.cu:853-926`)
  gaussian_downsample                     <- gaussian_downsample_cuda 5x5
                                             binomial, border-renormalized
                                             (`tracking.cu:533-599`)
  gaussian_filter                         <- gaussian_filter_cuda (`:705-775`)
  bilateral_filter                        <- bilateral_filter_cuda (`:777-848`)
  bilinear_sample / nearest_sample        <- torch.F.grid_sample call sites in
                                             `src/core/optimizer.py:305-308,353-354`
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# --- depth -> vertex / normal maps -----------------------------------------


def vertex_from_depth(depth: jnp.ndarray, intr) -> jnp.ndarray:
    """Back-project a depth map to camera-frame vertices.

    depth: (H, W) or (H, W, 1); intr: (fx, fy, cx, cy) array or tuple.
    Returns (H, W, 3). Matches `compute_vertex_map_kernel` (`tracking.cu:602-626`).
    """
    d = depth[..., 0] if depth.ndim == 3 else depth
    H, W = d.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=d.dtype), jnp.arange(W, dtype=d.dtype), indexing="ij")
    X = (xs - cx) * d / fx
    Y = (ys - cy) * d / fy
    return jnp.stack([X, Y, d], axis=-1)


def normal_from_vertex(vmap: jnp.ndarray) -> jnp.ndarray:
    """Forward-difference cross-product normals, NaN -> 0.

    n = normalize(cross(v[y+1]-v, v[x+1]-v)); last row/col reuse the center
    vertex (zero difference -> zero normal). Matches
    `compute_normal_map_kernel` (`tracking.cu:629-672`).
    """
    v00 = vmap
    v10 = jnp.concatenate([vmap[:, 1:], vmap[:, -1:]], axis=1)  # x+1 (clamped)
    v01 = jnp.concatenate([vmap[1:, :], vmap[-1:, :]], axis=0)  # y+1 (clamped)
    n = jnp.cross(v01 - v00, v10 - v00)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(norm > 1e-12, n / jnp.maximum(norm, 1e-12), 0.0)
    return n


def compute_vertex_and_normal(depth: jnp.ndarray, intr):
    vmap = vertex_from_depth(depth, intr)
    return vmap, normal_from_vertex(vmap)


# --- gradients ---------------------------------------------------------------

# Effective CORRELATION kernels of the reference's gradient_kernel:
# the CUDA loop walks kernel_index 8->0 while (dy,dx) walks forward, i.e. it
# convolves with gsx/gsy == correlates with the flipped kernel
# (`tracking.cu:853-893`). Flipped gsx = d/dx (positive to the right).
_SCHARR_X = np.array(
    [[-0.52201, 0.0, 0.52201], [-0.79451, 0.0, 0.79451], [-0.52201, 0.0, 0.52201]], dtype=np.float32
)
_SCHARR_Y = _SCHARR_X.T.copy()


def _correlate3x3(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """3x3 correlation with zero padding on a (H, W) image."""
    x = img[None, None]  # NCHW
    kern = jnp.asarray(k, dtype=img.dtype)[None, None]  # OIHW
    out = lax.conv_general_dilated(x, kern, window_strides=(1, 1), padding=((1, 1), (1, 1)))
    return out[0, 0]


def scharr_gradient(img: jnp.ndarray):
    """Scharr-like gradients of a (H, W) or (H, W, 1) image -> (gx, gy).

    Matches `compute_gradients_cuda` with the constants of `tracking.cu:903-909`
    (zero padding at borders).
    """
    im = img[..., 0] if img.ndim == 3 else img
    gx = _correlate3x3(im, _SCHARR_X)
    gy = _correlate3x3(im, _SCHARR_Y)
    return gx, gy


# --- Gaussian blur / downsample ---------------------------------------------

_BINOMIAL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32)
_GAUSS5x5 = np.outer(_BINOMIAL5, _BINOMIAL5)


def _conv2d_renorm(img: jnp.ndarray, kernel: np.ndarray, stride: int) -> jnp.ndarray:
    """Channel-wise 2D correlation with zero padding, renormalized by the sum
    of in-bounds weights (the CUDA kernels divide by the accumulated `count`,
    e.g. `tracking.cu:549-574`). img: (H, W, C)."""
    H, W, C = img.shape
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    x = jnp.moveaxis(img, -1, 0)[:, None]  # (C,1,H,W)
    k = jnp.asarray(kernel, img.dtype)[None, None]
    out = lax.conv_general_dilated(x, k, window_strides=(stride, stride), padding=((ph, ph), (pw, pw)))
    ones = jnp.ones((1, 1, H, W), img.dtype)
    norm = lax.conv_general_dilated(ones, k, window_strides=(stride, stride), padding=((ph, ph), (pw, pw)))
    out = out / norm
    return jnp.moveaxis(out[:, 0], 0, -1)


def gaussian_downsample(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 binomial blur + 2x decimation, border-renormalized.

    Output pixel (x, y) = renormalized blur of input around (2x, 2y); output
    size floor(H/2) x floor(W/2). Matches `gaussian_downsample_kernel`
    (`tracking.cu:533-575`). Accepts (H, W, C) or (H, W).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, _ = img.shape
    out = _conv2d_renorm(img, _GAUSS5x5, stride=2)
    out = out[: H // 2, : W // 2]
    return out[..., 0] if squeeze else out


def gaussian_filter(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Spatial Gaussian filter, border-renormalized (`tracking.cu:705-775`)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    r = window_size // 2
    ax = np.arange(-r, r + 1, dtype=np.float32)
    d2 = ax[:, None] ** 2 + ax[None, :] ** 2
    kernel = np.exp(-d2 / (2.0 * sigma * sigma))
    out = _conv2d_renorm(img, kernel, stride=1)
    return out[..., 0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("window_size",))
def bilateral_filter(img: jnp.ndarray, window_size: int = 13, sigma_color: float = 0.03, sigma_space: float = 4.5) -> jnp.ndarray:
    """Single-channel bilateral filter matching `bilateral_filter_kernel`
    (`tracking.cu:777-848`): zero padding is emulated by excluding
    out-of-bounds taps from both numerator and normalizer.

    img: (H, W) or (H, W, 1). The reference applies it to metric depth with
    (13, 0.03, 4.5) at `frame.py:132` and per pyramid level at `frame.py:84`.

    Implementation: unrolled shifted-window accumulation; XLA fuses the taps
    into a single VPU loop. The 13x13 window costs 169 exp/pixel; on TPU the
    separable variant `bilateral_filter_separable` is preferred for speed.
    """
    squeeze = img.ndim == 3
    x = img[..., 0] if squeeze else img
    r = window_size // 2
    H, W = x.shape
    inv_s = 1.0 / (2.0 * sigma_space * sigma_space)
    inv_c = 1.0 / (2.0 * sigma_color * sigma_color)

    pad = jnp.pad(x, ((r, r), (r, r)))
    valid = jnp.pad(jnp.ones_like(x), ((r, r), (r, r)))

    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = lax.dynamic_slice(pad, (r + dy, r + dx), (H, W))
            vm = lax.dynamic_slice(valid, (r + dy, r + dx), (H, W))
            dc = x - nb
            w = jnp.exp(-(dy * dy + dx * dx) * inv_s - dc * dc * inv_c) * vm
            num = num + nb * w
            den = den + w
    out = num / den
    return out[..., None] if squeeze else out


@functools.partial(jax.jit, static_argnames=("window_size",))
def bilateral_filter_separable(img: jnp.ndarray, window_size: int = 13, sigma_color: float = 0.03, sigma_space: float = 4.5) -> jnp.ndarray:
    """Separable approximation of the bilateral filter (row pass then column
    pass). 2*W taps instead of W^2 — the standard fast approximation; used on
    the hot level-0 depth pass where the exact version's 169 exp/pixel would
    dominate the frame budget. Not bit-identical to `bilateral_filter`.
    """
    squeeze = img.ndim == 3
    x = img[..., 0] if squeeze else img
    r = window_size // 2
    inv_s = 1.0 / (2.0 * sigma_space * sigma_space)
    inv_c = 1.0 / (2.0 * sigma_color * sigma_color)

    def pass1d(v, axis):
        H, W = v.shape
        pad_width = ((r, r), (0, 0)) if axis == 0 else ((0, 0), (r, r))
        pad = jnp.pad(v, pad_width)
        valid = jnp.pad(jnp.ones_like(v), pad_width)
        num = jnp.zeros_like(v)
        den = jnp.zeros_like(v)
        for d in range(-r, r + 1):
            start = (r + d, 0) if axis == 0 else (0, r + d)
            nb = lax.dynamic_slice(pad, start, (H, W))
            vm = lax.dynamic_slice(valid, start, (H, W))
            dc = v - nb
            w = jnp.exp(-(d * d) * inv_s - dc * dc * inv_c) * vm
            num = num + nb * w
            den = den + w
        return num / den

    out = pass1d(pass1d(x, 0), 1)
    return out[..., None] if squeeze else out


# --- grid sampling (torch.F.grid_sample equivalents) -------------------------


def _unnormalize(coords: jnp.ndarray, H: int, W: int):
    """[-1, 1] normalized coords -> pixel coords, align_corners=True."""
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    return x, y


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray, padding: str = "zeros") -> jnp.ndarray:
    """Bilinear sample of (H, W, C) at normalized coords (..., 2) (x, y in
    [-1, 1], align_corners=True). padding: 'zeros' | 'border'.

    Matches torch.nn.functional.grid_sample(mode='bilinear') semantics at the
    reference call sites (`optimizer.py:305-308`).
    """
    H, W, C = img.shape
    x, y = _unnormalize(coords, H, W)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(ix, iy):
        ic = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        jc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        vals = img[jc, ic]
        if padding == "zeros":
            inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)).astype(img.dtype)
            vals = vals * inb[..., None]
        return vals

    v00 = gather(x0, y0)
    v10 = gather(x0 + 1, y0)
    v01 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    w00 = ((1 - dx) * (1 - dy))[..., None]
    w10 = (dx * (1 - dy))[..., None]
    w01 = ((1 - dx) * dy)[..., None]
    w11 = (dx * dy)[..., None]
    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def nearest_sample(img: jnp.ndarray, coords: jnp.ndarray, padding: str = "border") -> jnp.ndarray:
    """Nearest-neighbor sample of (H, W, C) at normalized coords (..., 2).

    Matches torch grid_sample(mode='nearest') (`optimizer.py:353-354`):
    round-half-away behavior approximated by round-half-even (negligible on
    real data), border or zeros padding.
    """
    H, W, C = img.shape
    x, y = _unnormalize(coords, H, W)
    ix = jnp.rint(x)
    iy = jnp.rint(y)
    ic = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
    jc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
    vals = img[jc, ic]
    if padding == "zeros":
        inb = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)).astype(img.dtype)
        vals = vals * inb[..., None]
    return vals


def diff_gradients(depth: jnp.ndarray):
    """torch.diff-style forward gradients with edge replication append
    (reference `src/utils/eval_utils.py:15-32`, used by `system.py:92`).
    depth: (H, W) or (H, W, 1) -> (gx, gy), each (H, W)."""
    d = depth[..., 0] if depth.ndim == 3 else depth
    gx = jnp.concatenate([d[:, 1:] - d[:, :-1], jnp.zeros_like(d[:, :1])], axis=1)
    gy = jnp.concatenate([d[1:, :] - d[:-1, :], jnp.zeros_like(d[:1, :])], axis=0)
    return gx, gy

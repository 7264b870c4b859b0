"""Image-processing kernels: the TPU-native equivalents of the reference's
`cuda_tracking_ext` (`/root/reference/src/utils/cuda/src/tracking.cu`).

All functions are pure jnp, jit-friendly (static shapes), and vectorize onto
the TPU VPU via XLA (the separable/shift-add decompositions below were chosen
over hand-written Pallas kernels after profiling — XLA fuses them well).

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

    Channel-split internally: (H, W, 3) math uses 3/128 VPU lanes, so the
    cross/normalize run on (H, W) planes and re-stack only at the end.
    """
    ax, ay, az, bx, by, bz = _vertex_diff_planes(
        vmap[..., 0], vmap[..., 1], vmap[..., 2]
    )
    return _cross_normalize_planes(ax, ay, az, bx, by, bz)


def _vertex_diff_planes(X, Y, Z):
    """Forward differences a = v[y+1]-v, b = v[x+1]-v as 6 (H, W) planes."""

    def dx(p):
        return jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1) - p

    def dy(p):
        return jnp.concatenate([p[1:, :], p[-1:, :]], axis=0) - p

    return dy(X), dy(Y), dy(Z), dx(X), dx(Y), dx(Z)


def _cross_normalize_planes(ax, ay, az, bx, by, bz):
    nx = ay * bz - az * by
    ny = az * bx - ax * bz
    nz = ax * by - ay * bx
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    scale = jnp.where(norm > 1e-12, 1.0 / jnp.maximum(norm, 1e-12), 0.0)
    return jnp.stack([nx * scale, ny * scale, nz * scale], axis=-1)


def compute_vertex_and_normal(depth: jnp.ndarray, intr):
    """Vertex + normal maps from depth; all math on (H, W) planes (full VPU
    lanes), stacked to (H, W, 3) only for the outputs."""
    d = depth[..., 0] if depth.ndim == 3 else depth
    H, W = d.shape
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=d.dtype), jnp.arange(W, dtype=d.dtype), indexing="ij")
    X = (xs - cx) * d / fx
    Y = (ys - cy) * d / fy
    vmap = jnp.stack([X, Y, d], axis=-1)
    nmap = _cross_normalize_planes(*_vertex_diff_planes(X, Y, d))
    return vmap, nmap


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
    """3x3 correlation with zero padding on a (H, W) image.

    Shift-add instead of `lax.conv_general_dilated`: a 1-channel conv can't
    use the MXU and lowers ~100x slower than this fused elementwise form.
    """
    H, W = img.shape
    pad = jnp.pad(img, ((1, 1), (1, 1)))
    out = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            if k[dy, dx] != 0.0:
                out = out + k[dy, dx] * lax.dynamic_slice(pad, (dy, dx), (H, W))
    return out


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
    e.g. `tracking.cu:549-574`). img: (H, W, C).

    All kernels used here are separable outer products (binomial, Gaussian),
    and the in-bounds renormalizer of a separable kernel over an axis-aligned
    border factorizes into row * column sums — so this runs as two shift-add
    1D passes (full VPU lanes, fully fused) plus a broadcast renorm from tiny
    trace-time numpy vectors. `lax.conv_general_dilated` with 1-3 channels
    would bypass the MXU and run ~100x slower.
    """
    H, W, C = img.shape
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    # exact separation: kernel == outer(ky, kx) for binomial/Gaussian kernels
    ky = kernel[:, pw].astype(np.float64)
    kx = kernel[ph, :].astype(np.float64) / float(kernel[ph, pw])
    assert np.allclose(np.outer(ky, kx), kernel, rtol=1e-6), "kernel not separable"

    def pass1d(x, taps, axis):
        n = taps.shape[0]
        r = n // 2
        pad_width = [(0, 0)] * x.ndim
        pad_width[axis] = (r, r)
        pad = jnp.pad(x, pad_width)
        out = jnp.zeros_like(x)
        start = [0] * x.ndim
        for d in range(n):
            start[axis] = d
            out = out + taps[d] * lax.dynamic_slice(pad, start, x.shape)
        return out

    if stride > 1:
        # blur + decimate + renorm as TWO banded matmuls on the MXU:
        # out = Dr @ img @ Dc^T with the in-bounds renorm folded into the
        # rows of Dr/Dc. A strided slice x[::2, ::2] lowers to a gather on
        # TPU (~2.3 ms per 0.2 MP channel); the matmul form is ~100x faster.
        Dr = _decimation_matrix(H, ky, stride)
        Dc = _decimation_matrix(W, kx, stride)
        x = jnp.moveaxis(img, -1, 0)  # (C, H, W)
        out = jnp.einsum("oh,chw->cow", jnp.asarray(Dr), x)
        out = jnp.einsum("wv,cov->cow", jnp.asarray(Dc), out)
        return jnp.moveaxis(out, 0, -1)

    # channels to the FRONT: (H, W, C) with C minor uses C/128 VPU lanes
    x = jnp.moveaxis(img, -1, 0)  # (C, H, W)
    x = pass1d(x, ky.astype(np.float32), 1)
    x = pass1d(x, kx.astype(np.float32), 2)

    # in-bounds weight sums per row / column (numpy, trace-time constants)
    ny = np.convolve(np.ones(H), ky[::-1], mode="same")
    nx = np.convolve(np.ones(W), kx[::-1], mode="same")
    inv = (1.0 / ny[:, None] / nx[None, :]).astype(np.float32)
    x = x * jnp.asarray(inv)[None]
    return jnp.moveaxis(x, 0, -1)


@functools.lru_cache(maxsize=None)
def _decimation_matrix_cached(n: int, taps_key, stride: int):
    taps = np.asarray(taps_key, np.float64)
    r = len(taps) // 2
    no = -(-n // stride)  # ceil(n / stride): positions 0, stride, 2*stride, ...
    D = np.zeros((no, n), np.float32)
    for o in range(no):
        c = o * stride
        lo, hi = max(0, c - r), min(n, c + r + 1)
        w = taps[lo - c + r : hi - c + r]
        D[o, lo:hi] = w / w.sum()
    return D


def _decimation_matrix(n: int, taps: np.ndarray, stride: int) -> np.ndarray:
    """(ceil(n/stride), n) banded blur+decimate matrix, rows renormalized by
    the in-bounds weight sum (the reference kernels' `count` division)."""
    return _decimation_matrix_cached(n, tuple(np.asarray(taps, np.float64).tolist()), stride)


def decimate2d(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Exact x[::stride, ::stride] decimation of (H, W[, C]) via one-hot
    selection matmuls on the MXU. A strided slice lowers to a gather on TPU
    (~2.3 ms per 0.2 MP plane); this form is ~100x faster and bit-exact
    (each output is 1.0 * input + zeros)."""
    if stride == 1:
        return x
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    H, W, _ = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32) if dt in (jnp.bool_, jnp.int32) else x
    Sr = jnp.asarray(_decimation_matrix(H, np.array([1.0]), stride))
    Sc = jnp.asarray(_decimation_matrix(W, np.array([1.0]), stride))
    xm = jnp.moveaxis(xf, -1, 0)  # (C, H, W)
    out = jnp.einsum("oh,chw->cow", Sr, xm)
    out = jnp.einsum("wv,cov->cow", Sc, out)
    out = jnp.moveaxis(out, 0, -1)
    if dt == jnp.bool_:
        out = out > 0.5
    elif dt == jnp.int32:
        out = jnp.rint(out).astype(dt)
    return out[..., 0] if squeeze else out


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

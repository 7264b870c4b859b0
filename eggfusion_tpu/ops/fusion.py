"""Probabilistic surfel fusion — TPU-native equivalent of the reference's
`project_surfels_to_frame` + `preprocess_surfels` CUDA kernels
(submodule `diff-gaussian-surfels`; Python call sites fully specify the
interface at `/root/reference/src/core/mapper.py:266-308`).

Semantics (information-form filter, matching the reference's state layout):
each surfel carries an information vector eta = [x * lam_p, n * lam_n] and
variances sigma2 = [1/lam_p, 1/lam_n] (init at `mapper.py:480-490`:
eta = x0 / sigma2, sigma2 = (alpha * depth)^2). A frame measurement at pixel
p with depth d contributes precision lam_meas = 1/(alpha*d)^2:

    lam  <- lam + lam_meas
    eta  <- eta + x_meas * lam_meas
    x    <- eta / lam          (fused position / normal)

The association is 1:1 by construction: a surfel lands on exactly one pixel
(its projected center) and a pixel keeps one surfel (nearest wins in the
z-buffered index map). So the fusion update is a pure per-surfel GATHER —
each surfel reads the measurement at its own pixel and checks it won the
index map — instead of the scatter-add/segment-sum the CUDA kernel uses
(atomics are cheap on GPU; on TPU a scatter-add serializes).

`project_surfels_to_frame` builds the per-pixel nearest-surfel index map via
scatter-min z-buffering (XLA `.at[].min`), the one (cheap, int) scatter left.

Layout: surfel state is the transposed (k, N) SoA (`core.surfels`), so every
per-surfel chain here is componentwise on (N,) rows — full TPU lane width.
The one row-layout interface left is the measurement gather: a packed
(H, W, 11) image gathered by 2-D pixel index (measured 4.5x faster than the
flat-index gather at 600k surfels on v5e), transposed once to (11, N).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eggfusion_tpu.core.surfels import SurfelConfig, SurfelMap
from eggfusion_tpu.geometry import sh as shlib
from eggfusion_tpu.geometry import transforms as tf


def _center_pixels(xyz, active, w2c, intr, width: int, height: int):
    """Each surfel's rounded center pixel (u, v int coords), validity, z.

    xyz: (3, N) transposed positions.
    """
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    p_cam = w2c[:3, :3] @ xyz + w2c[:3, 3][:, None]  # (3, N)
    z = p_cam[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = jnp.round(fx * p_cam[0] / z_safe + cx).astype(jnp.int32)
    v = jnp.round(fy * p_cam[1] / z_safe + cy).astype(jnp.int32)
    ok = active & (z > 0.05) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    return u, v, ok, z


@functools.partial(jax.jit, static_argnames=("width", "height"))
def project_surfels_to_frame(xyz: jnp.ndarray, active: jnp.ndarray, w2c: jnp.ndarray,
                             intr: jnp.ndarray, width: int, height: int):
    """Per-pixel nearest-surfel index map + depth buffer.

    Interface mirror of `project_surfels_to_frame` (`mapper.py:266-276`).
    xyz is (3, N) transposed. Returns (imap (H, W) int32, -1 where empty;
    depth_buff (H, W) f32, 0 where empty). Each surfel lands on its center
    pixel; the nearest (min z) wins.
    """
    u, v, ok, z = _center_pixels(xyz, active, w2c, intr, width, height)
    HW = width * height
    pix = jnp.where(ok, v * width + u, HW)  # dump slot
    zbuf = jnp.full((HW + 1,), jnp.inf, jnp.float32).at[pix].min(jnp.where(ok, z, jnp.inf))
    # winner: among surfels whose z equals the buffer min at their pixel,
    # take the max index (deterministic tie-break)
    iswin = ok & (z <= zbuf[pix])
    n = xyz.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    imap = jnp.full((HW + 1,), -1, jnp.int32).at[pix].max(jnp.where(iswin, idx, -1))
    depth = jnp.where(jnp.isfinite(zbuf[:HW]), zbuf[:HW], 0.0)
    return imap[:HW].reshape(height, width), depth.reshape(height, width)


class FusionStats(NamedTuple):
    fused_pixels: jnp.ndarray  # () i32 number of pixels fused into surfels
    error_pixels: jnp.ndarray  # () i32 association failures counted as errors


# winner-sort depth quantization: 12 bits over [0, 20 m) -> 4.9 mm buckets.
# Ties within a bucket break to the lower surfel index (stable sort).
WINNER_DEPTH_BITS = 12
WINNER_DEPTH_FAR = 20.0


def winner_flags(xyz, active, w2c, intr, width: int, height: int):
    """Per-surfel nearest-at-its-pixel flags via ONE radix-style sort.

    Same association as `project_surfels_to_frame` + an index-map gather
    (the surfel is the min-depth occupant of its center pixel) but computed
    WITHOUT the z-buffer: a scatter-min + gather + scatter-max costs ~12.5 ms
    at 600k on v5e (scatters serialize), while sort by (pixel, depth) + the
    payload-carried inverse sort is ~1.9 ms. Returns (winner (N,) bool,
    uc (N,) i32, vc (N,) i32) with uc/vc clipped to the frame.
    """
    u, v, ok, z = _center_pixels(xyz, active, w2c, intr, width, height)
    HW = width * height
    n = z.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pix = jnp.where(ok, v * width + u, HW)
    if (HW + 1) << WINNER_DEPTH_BITS <= 1 << 32:
        # fused u32 key: pixel id | quantized depth (one single-key sort)
        qmax = (1 << WINNER_DEPTH_BITS) - 1
        qz = jnp.clip(z * (qmax / WINNER_DEPTH_FAR), 0, qmax).astype(jnp.uint32)
        key = (pix.astype(jnp.uint32) << WINNER_DEPTH_BITS) | qz
        skey, sidx = jax.lax.sort((key, idx), num_keys=1)
        spix = (skey >> WINNER_DEPTH_BITS).astype(jnp.int32)
    else:  # very large frames: exact two-key lexicographic sort
        spix, _, sidx = jax.lax.sort((pix, z, idx), num_keys=2)
    first = jnp.concatenate([jnp.ones((1,), bool), spix[1:] != spix[:-1]])
    win_sorted = first & (spix < HW)
    _, winner = jax.lax.sort((sidx, win_sorted), num_keys=1)
    return winner & ok, jnp.clip(u, 0, width - 1), jnp.clip(v, 0, height - 1)


def _fuse_with_winner(
    s: SurfelMap,
    winner: jnp.ndarray,  # (N,) bool: surfel is the nearest at its pixel
    uc: jnp.ndarray,  # (N,) i32 clipped center-pixel coords
    vc: jnp.ndarray,
    vertex_w, normal_w, color, depth, geo_mask,
    fusion_dist_thres: float,
    cfg: SurfelConfig,
):
    """Information-filter fusion given the per-surfel association flags
    (reference `preprocess_surfels` call, `mapper.py:278-308`): update of
    position/normal, observe/error counting.

    Association gates: the surfel won its pixel, valid measurement
    (geo_mask & depth > 0), |measured vertex - surfel position| <
    fusion_dist_thres, and normal agreement (dot > cos 60 deg). Disagreeing
    but visible surfels increment error_count.
    """
    # ONE packed 2-D row gather for all per-pixel measurements: gather cost on
    # TPU is dominated by the random index stream, not the row width, so 5
    # separate N-row gathers (~4-5 ms each at 600k on v5e) collapse into one;
    # 2-D (v, u) indexing beats the flat-index gather 4.5x.
    meas = jnp.concatenate(
        [vertex_w, normal_w, color, depth, geo_mask.astype(jnp.float32)], axis=-1
    )[vc, uc]  # (N, 11)
    mT = meas.T  # (11, N) — cheap; everything below is (N,)-componentwise
    v_m = mT[0:3]
    n_m = mT[3:6]
    c_m = mT[6:9]
    d_m = mT[9]
    valid_meas = (mT[10] > 0.5) & (d_m > 0)

    dvec = v_m - s.xyz
    dist2 = dvec[0] ** 2 + dvec[1] ** 2 + dvec[2] ** 2
    n_s = s.get_normal()  # (3, N)
    ndot = n_m[0] * n_s[0] + n_m[1] * n_s[1] + n_m[2] * n_s[2]
    associate = (
        winner & valid_meas & (dist2 < fusion_dist_thres * fusion_dist_thres)
        & (jnp.abs(ndot) > 0.5)
    )
    errors = winner & valid_meas & ~associate

    # flip measured normal to the surfel's hemisphere before fusing
    n_m = n_m * jnp.where(ndot < 0, -1.0, 1.0)

    lam_p = jnp.where(associate, 1.0 / jnp.maximum((d_m * cfg.alpha_p) ** 2, 1e-12), 0.0)
    lam_n = jnp.where(associate, 1.0 / jnp.maximum((d_m * cfg.alpha_n) ** 2, 1e-12), 0.0)

    lam_p_old = 1.0 / s.sigma2[0]
    lam_n_old = 1.0 / s.sigma2[1]
    lam_p_new = lam_p_old + lam_p
    lam_n_new = lam_n_old + lam_n

    eta_new = s.eta + jnp.concatenate([v_m * lam_p, n_m * lam_n], axis=0)  # (6, N)
    xyz_new = eta_new[0:3] / lam_p_new
    normal_new = eta_new[3:6] / lam_n_new
    normal_new = normal_new / (
        jnp.sqrt(normal_new[0] ** 2 + normal_new[1] ** 2 + normal_new[2] ** 2) + 1e-8
    )

    touched = associate
    # only fuse geometry of touched, UNSTABLE surfels: stable surfels are
    # geometry-locked (matches the reference's stable/unstable split intent,
    # `mapper.py:326-334`) so the optimizer-refined map is not overwritten.
    fuse_geo = touched & ~s.stable & s.active

    rot_new = tf.rot_z_to_t(normal_new)  # (4, N)

    old_color = s.get_color()  # (3, N)
    col_new = (old_color * lam_p_old + c_m * lam_p) / lam_p_new
    dc_new = shlib.rgb_to_sh(col_new)[:, None, :]  # (3, 1, N)

    fg = fuse_geo[None]
    tc = touched[None]
    s = s.replace(
        xyz=jnp.where(fg, xyz_new, s.xyz),
        rotation=jnp.where(fg, rot_new, s.rotation),
        features_dc=jnp.where(fuse_geo[None, None], dc_new, s.features_dc),
        eta=jnp.where(tc, eta_new, s.eta),
        sigma2=jnp.where(
            tc,
            jnp.stack([1.0 / lam_p_new, 1.0 / lam_n_new], axis=0),
            s.sigma2,
        ),
        observe_count=s.observe_count + touched.astype(jnp.int32),
        error_count=s.error_count + errors.astype(jnp.int32),
    )
    stats = FusionStats(
        fused_pixels=jnp.sum(associate.astype(jnp.int32)),
        error_pixels=jnp.sum(errors.astype(jnp.int32)),
    )
    return s, stats


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_surfels(
    s: SurfelMap,
    imap: jnp.ndarray,  # (H, W) i32 from project_surfels_to_frame
    w2c: jnp.ndarray,  # (4, 4) same camera the imap was built with
    intr: jnp.ndarray,  # (4,)
    vertex_w: jnp.ndarray,  # (H, W, 3) measured vertices, world frame
    normal_w: jnp.ndarray,  # (H, W, 3) measured normals, world frame
    color: jnp.ndarray,  # (H, W, 3)
    depth: jnp.ndarray,  # (H, W, 1) metric depth
    geo_mask: jnp.ndarray,  # (H, W, 1) bool valid-geometry mask
    fusion_dist_thres: float,
    cfg: SurfelConfig,
):
    """Fusion against an explicit index map (oracle/compat path): the winner
    flag is gathered from `imap` (exact f32 z-buffer association)."""
    H, W = imap.shape
    N = s.capacity
    u, v, ok, _z = _center_pixels(s.xyz, s.active, w2c, intr, W, H)
    uc = jnp.clip(u, 0, W - 1)
    vc = jnp.clip(v, 0, H - 1)
    winner = ok & (imap[vc, uc] == jnp.arange(N, dtype=jnp.int32))
    return _fuse_with_winner(
        s, winner, uc, vc, vertex_w, normal_w, color, depth, geo_mask,
        fusion_dist_thres, cfg,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def fuse_frame(
    s: SurfelMap,
    w2c: jnp.ndarray,
    intr: jnp.ndarray,
    vertex_w: jnp.ndarray,  # (H, W, 3)
    normal_w: jnp.ndarray,  # (H, W, 3)
    color: jnp.ndarray,  # (H, W, 3)
    depth: jnp.ndarray,  # (H, W, 1)
    geo_mask: jnp.ndarray,  # (H, W, 1)
    fusion_dist_thres: float,
    cfg: SurfelConfig,
):
    """One-shot per-frame fusion: sort-based winner association + gather-form
    information fusion, no index map materialized. This is the hot path
    (`core.mapper.map_update`): association ~1.9 ms vs the z-buffer + winner
    gather's ~18 ms at 600k capacity on v5e.
    """
    H, W = vertex_w.shape[:2]
    winner, uc, vc = winner_flags(s.xyz, s.active, w2c, intr, W, H)
    return _fuse_with_winner(
        s, winner, uc, vc, vertex_w, normal_w, color, depth, geo_mask,
        fusion_dist_thres, cfg,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def prune_unstable(s: SurfelMap, cfg: SurfelConfig, time: jnp.ndarray, max_age: int = 30):
    """Free-space violation culling: surfels observed mostly in error and old
    unstable surfels that never gained confidence are removed.

    The reference defines `cull_dist_thres` and error counting but never wires
    a visible cull call (`merge_surfels` dead code, `mapper.py:508-563`); this
    is the working equivalent keeping map size bounded.
    """
    from eggfusion_tpu.core.surfels import prune_surfels

    age = time - s.tic
    bad_errors = (s.error_count > 5) & (s.error_count > 3 * s.observe_count)
    stale = (age > max_age) & (~s.stable) & (s.observe_count < 2)
    return prune_surfels(s, s.active & (bad_errors | stale))

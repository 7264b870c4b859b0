"""Pallas TPU tile-based differentiable surfel rasterizer.

TPU-native replacement for the reference's CUDA `diff_gaussian_rasterization`
submodule (interface contract at `/root/reference/src/core/render.py:53-104`):
given camera + surfel render params, produce (color, normal, depth, opacity)
images with gradients. Numerics match the golden XLA compositor
(`ops/raster_xla.py`); this kernel replaces its O(N*H*W) all-pairs blend with
the classic splatting pipeline, re-shaped for TPU:

  1. project (XLA, differentiable) — shared `raster_common.project_surfels`.
  2. depth-sort surfels once, globally (XLA argsort).
  3. tile binning (XLA, non-diff): each surfel emits up to KX*KY candidate
     (tile, surfel) entries from a fixed window anchored at its bbox corner;
     a single stable sort by tile id yields per-tile contiguous, depth-ordered
     entry runs (fixed candidate count replaces the CUDA variable-length
     duplication + radix sort; stability preserves the depth order).
  4. per-tile gather of a fixed-capacity (CAP) entry slab: (T, CAP, 16)
     attribute array. Differentiable gather — the backward is the segment-sum
     XLA generates for free.
  5. Pallas compositing kernel: grid over tiles, each instance front-to-back
     alpha-blends its slab over a TILE_H x TILE_W pixel block (lane-aligned),
     processing entries in 8-row chunks (one VMEM row-block load + static
     unroll amortizes the dynamic-slice overhead), with early exit when the
     whole block's transmittance saturates.
  6. custom VJP: the backward kernel first re-sweeps alphas forward, writing
     per-chunk transmittance checkpoints to a VMEM scratch buffer (~1 MB —
     never touches HBM; an earlier revision stored them as a forward output,
     paying a ~220 MB HBM round trip per render at 220 tiles, measurably
     slower than the ~6 ms alpha-only recompute), then walks chunks in
     reverse carrying suffix accumulators — the d(out)/d(alpha_i) =
     T_i c_i - S_i/(1-alpha_i) recurrence of the 3DGS backward, done per
     4096-pixel vector block instead of per CUDA thread. Per-entry
     transmittances are recomputed forward from the exact chunk checkpoint,
     so there is NO 1/(1-alpha) rollback division (the CUDA backward
     accumulates that drift over the whole list).

Deviations from the CUDA rasterizer (documented, not accidental):
  * tiles are 32x128 pixels (VPU-shaped), not 16x16 (warp-shaped).
  * a surfel's footprint is truncated to a KX*KY-tile window (256x64 px,
    binning radius clamped to 15.5 px vertically); splats larger than that
    are rare in fused SLAM maps (scale ~ 2px*d/f).
  * per-tile entry capacity CAP is static; overflow drops the FARTHEST
    surfels (entries are depth-sorted, and a tile that deep is saturated).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eggfusion_tpu.ops import raster_common as rc

import os as _os

# Tile height is the compositor's main cost/quality trade dial when moved
# TOGETHER with the entry cap: per-pixel sweep work = cap, and the cap a tile
# needs for equal coverage scales with its area — so TILE_H 32 -> 16 with
# cap 512 -> 256 keeps the same entries-per-pixel density at ~half the
# per-pixel work. (Moving TILE_H alone at a FIXED cap is strictly worse:
# TILE_H=8 at cap 512 measured 2.5x slower fwd, because 4x more tiles each
# still saturate the oversized cap.) Overridable for experiments via env.
TILE_H = int(_os.environ.get("EGG_RASTER_TILE_H", 32))
TILE_W = 128
KX = 2  # candidate tile window, x (256 px: covers radius <= 63 px)
KY = 2  # candidate tile window, y (2*TILE_H px: covers radius <=
#         (2*TILE_H-1)/2 px — the binning radius is clamped to that; see
#         _bin_entries. Binning sort cost AND the backward's back_map gather
#         scale with KX*KY, so the window is the single biggest rasterizer
#         cost knob.)
BIN_RADIUS_MAX_Y = (KY * TILE_H - 1) / 2  # binning-extent clamp (px); alpha
#         is NOT clamped — a taller splat just truncates to the KY-tile-row
#         window, the same policy the fixed window applies to very wide splats
CHUNK = 8  # entries per VMEM row-block load (and backward checkpoint period)
STOP_EPS = 1e-4  # block-level transmittance early-exit (3DGS T_EPS)

# entry attribute layout (lane index in the (CAP, 16) slab)
A_U, A_V = 0, 1
A_CA, A_CB, A_CC = 2, 3, 4
A_OP = 5
A_R, A_G, A_B = 6, 7, 8
A_NX, A_NY, A_NZ = 9, 10, 11
A_PX, A_PY, A_PZ = 12, 13, 14
A_VAL = 15
N_ATTR = 16


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# shared per-entry math
# --------------------------------------------------------------------------


def _pixel_grid(t, tx_tiles, intr_ref):
    """Per-block pixel coords and camera rays."""
    x0 = (t % tx_tiles) * TILE_W
    y0 = (t // tx_tiles) * TILE_H
    xs = x0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    ys = y0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    fx = intr_ref[0, 0]
    fy = intr_ref[0, 1]
    cx = intr_ref[0, 2]
    cy = intr_ref[0, 3]
    rx = (xs - cx) / fx
    ry = (ys - cy) / fy
    return xs, ys, rx, ry


def _entry_alpha(ch, xs, ys):
    """Alpha map of one entry row ch (16,)."""
    dx = xs - ch[A_U]
    dy = ys - ch[A_V]
    power = -0.5 * (ch[A_CA] * dx * dx + ch[A_CC] * dy * dy) - ch[A_CB] * dx * dy
    raw = ch[A_OP] * jnp.exp(power)
    alpha = jnp.minimum(rc.MAX_ALPHA, raw) * ch[A_VAL]
    return jnp.where(alpha >= rc.ALPHA_EPS, alpha, 0.0), raw, dx, dy


def _entry_zpx(ch, rx, ry):
    """Per-pixel ray/surfel-plane depth of one entry (matches raster_xla)."""
    nx, ny, nz = ch[A_NX], ch[A_NY], ch[A_NZ]
    px, py, pz = ch[A_PX], ch[A_PY], ch[A_PZ]
    denom = rx * nx + ry * ny + nz
    pn = px * nx + py * ny + pz * nz
    denom_ok = jnp.abs(denom) >= 1e-6
    denom_safe = jnp.where(denom_ok, denom, 1e-6)
    z_plane = pn / denom_safe
    use_plane = (z_plane > rc.NEAR_Z) & denom_ok
    return jnp.where(use_plane, z_plane, pz), denom_safe, pn, use_plane


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _make_fwd_kernel(tx_tiles: int, cap: int, geom: bool = False):
    """Forward compositor.

    `geom` composites only depth + opacity (no color/normal accumulation) —
    the per-frame fusion/spawn render (`core.mapper.map_update`) reads only
    those two channels, and dropping the other six halves the per-entry
    FMA work."""
    n_chunks_max = cap // CHUNK

    def kernel(counts_ref, intr_ref, entries_ref, *out_refs):
        if geom:
            dep_ref, opa_ref, T_ref = out_refs[:3]
        else:
            rgb_ref, nrm_ref, dep_ref, opa_ref, T_ref = out_refs[:5]
        t = pl.program_id(0)
        xs, ys, rx, ry = _pixel_grid(t, tx_tiles, intr_ref)
        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        count = jnp.minimum(counts_ref[t, 0], cap)
        n_chunks = jnp.minimum((count + CHUNK - 1) // CHUNK, n_chunks_max)

        # chunked: one (CHUNK, 16) row-block load + static unroll per chunk
        # amortizes the dynamic-slice / scalar-extract overhead 8x vs a
        # per-entry loop. Rows past `count` carry A_VAL = 0 -> alpha 0.
        def cond(carry):
            i = carry[0]
            T = carry[-1]
            return (i < n_chunks) & (jnp.max(T) > STOP_EPS)

        def body(carry):
            if geom:
                i, dep, opa, T = carry
            else:
                i, r, g, b, nx, ny, nz, dep, opa, T = carry
            ch = entries_ref[0, pl.ds(i * CHUNK, CHUNK), :]
            for k in range(CHUNK):
                alpha, _, _, _ = _entry_alpha(ch[k], xs, ys)
                z_px, _, _, _ = _entry_zpx(ch[k], rx, ry)
                w = T * alpha
                if not geom:
                    r = r + w * ch[k, A_R]
                    g = g + w * ch[k, A_G]
                    b = b + w * ch[k, A_B]
                    nx = nx + w * ch[k, A_NX]
                    ny = ny + w * ch[k, A_NY]
                    nz = nz + w * ch[k, A_NZ]
                dep = dep + w * z_px
                opa = opa + w
                T = T * (1.0 - alpha)
            if geom:
                return (i + 1, dep, opa, T)
            return (i + 1, r, g, b, nx, ny, nz, dep, opa, T)

        if geom:
            init = (jnp.int32(0), zero, zero, jnp.ones_like(zero))
            _, dep, opa, T = jax.lax.while_loop(cond, body, init)
        else:
            init = (jnp.int32(0), zero, zero, zero, zero, zero, zero, zero, zero, jnp.ones_like(zero))
            _, r, g, b, nx, ny, nz, dep, opa, T = jax.lax.while_loop(cond, body, init)
            rgb_ref[0, :, :] = r
            rgb_ref[1, :, :] = g
            rgb_ref[2, :, :] = b
            nrm_ref[0, :, :] = nx
            nrm_ref[1, :, :] = ny
            nrm_ref[2, :, :] = nz

        dep_ref[:, :] = dep
        opa_ref[:, :] = opa
        T_ref[:, :] = T

    return kernel


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _make_bwd_kernel(tx_tiles: int, cap: int):
    n_chunks_max = cap // CHUNK

    def kernel(
        counts_ref, intr_ref, entries_ref,
        g_rgb_ref, g_nrm_ref, g_dep_ref, g_opa_ref, g_T_ref,
        T_fin_ref,  # final transmittance (the forward's 5th output)
        dent_ref,
        T_ckpt,  # VMEM scratch: (n_chunks_max*TILE_H, TILE_W) chunk-start T
    ):
        t = pl.program_id(0)
        xs, ys, rx, ry = _pixel_grid(t, tx_tiles, intr_ref)
        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        count = jnp.minimum(counts_ref[t, 0], cap)
        n_chunks = jnp.minimum((count + CHUNK - 1) // CHUNK, n_chunks_max)

        dent_ref[0, :, :] = jnp.zeros((cap, N_ATTR), jnp.float32)

        # ---- phase 1: alpha-only forward re-sweep -> VMEM checkpoints ------
        # Same loop structure (incl. the early-exit predicate) as the forward
        # kernel, so `n_done` and every chunk-start T match the forward run
        # bit-for-bit. ~1 MB of scratch; never touches HBM (an earlier
        # revision shipped these checkpoints through a forward output, a
        # ~220 MB HBM round trip per render at 220 tiles — slower than this
        # recompute, which is alpha-only: no channel accumulation).
        def cond1(carry):
            i, T = carry
            return (i < n_chunks) & (jnp.max(T) > STOP_EPS)

        def body1(carry):
            i, T = carry
            T_ckpt[pl.ds(i * TILE_H, TILE_H), :] = T
            ch = entries_ref[0, pl.ds(i * CHUNK, CHUNK), :]
            for k in range(CHUNK):
                alpha, _, _, _ = _entry_alpha(ch[k], xs, ys)
                T = T * (1.0 - alpha)
            return i + 1, T

        n_done, _ = jax.lax.while_loop(
            cond1, body1, (jnp.int32(0), jnp.ones((TILE_H, TILE_W), jnp.float32))
        )
        T_fin = T_fin_ref[:, :]

        g_r = g_rgb_ref[0, :, :]
        g_g = g_rgb_ref[1, :, :]
        g_b = g_rgb_ref[2, :, :]
        g_nx = g_nrm_ref[0, :, :]
        g_ny = g_nrm_ref[1, :, :]
        g_nz = g_nrm_ref[2, :, :]
        g_dep = g_dep_ref[:, :]
        g_opa = g_opa_ref[:, :]
        g_T = g_T_ref[:, :]

        # ---- phase 2: reverse chunk walk with ONE suffix accumulator --------
        # Within each chunk the per-entry transmittances are recomputed
        # forward from the exact checkpoint — no 1/(1-alpha) rollback at all.
        #
        # The 3DGS backward carries one suffix image per output channel
        # (S_c = sum_{j>k} w_j c_j) and combines them as
        # galpha = sum_c g_c (T_k c_k - S_c/(1-a)). But S_c only ever appears
        # through B = sum_c g_c S_c, and B updates with the SAME per-entry
        # scalar combination A_k = sum_c g_c c_k that galpha needs anyway:
        #     galpha_k = T_k A_k - B/(1-a_k);   B += w_k A_k.
        # One suffix image + 1 FMA replace eight suffix images, eight FMA
        # updates and the nine-term recombination.
        #
        # The 15 per-entry scalar gradients are reduced PER CHUNK, not per
        # entry: each entry's reduction inputs are kept as images and the
        # chunk's 8 images per attribute collapse in ONE (CHUNK, TH*TW)
        # row-sum. Per-entry jnp.sum was the kernel's bottleneck — the
        # reduction's fixed cost made the backward invariant to tile size
        # (measured 21.9 ms per-entry vs 9.2 ms batched at TILE_H=16 on the
        # isolated sweep kernel, and batching is what lets smaller tiles
        # actually pay off).
        def body2(carry):
            ci, B = carry
            ch = entries_ref[0, pl.ds(ci * CHUNK, CHUNK), :]
            Tc = T_ckpt[pl.ds(ci * TILE_H, TILE_H), :]

            alphas, raws, dxs, dys, zpxs, zaux, Ts = [], [], [], [], [], [], []
            T = Tc
            for k in range(CHUNK):
                alpha, raw, dx, dy = _entry_alpha(ch[k], xs, ys)
                z_px, denom_safe, pn, use_plane = _entry_zpx(ch[k], rx, ry)
                alphas.append(alpha); raws.append(raw); dxs.append(dx); dys.append(dy)
                zpxs.append(z_px); zaux.append((denom_safe, pn, use_plane)); Ts.append(T)
                T = T * (1.0 - alpha)

            red_ins = [None] * CHUNK  # per entry: list of 15 reduction images
            for k in reversed(range(CHUNK)):
                alpha = alphas[k]
                Tk = Ts[k]
                w = Tk * alpha
                inv1m = 1.0 / (1.0 - alpha)
                z_px = zpxs[k]
                denom_safe, pn, use_plane = zaux[k]
                chk = ch[k]

                cr, cg, cb = chk[A_R], chk[A_G], chk[A_B]
                nxs, nys, nzs = chk[A_NX], chk[A_NY], chk[A_NZ]

                # A_k = sum_c g_c * c_k (opacity channel c = 1, depth c = z_px)
                A = (
                    g_r * cr + g_g * cg + g_b * cb
                    + g_nx * nxs + g_ny * nys + g_nz * nzs
                    + g_opa + g_dep * z_px
                )
                galpha = Tk * A - B * inv1m
                # alpha gates: clamped at MAX_ALPHA or below ALPHA_EPS -> 0
                live = (alpha > 0.0) & (raws[k] < rc.MAX_ALPHA)
                galpha = jnp.where(live, galpha, 0.0)

                # chain into splat params: alpha = op * exp(power)
                expp = jnp.where(live, raws[k] / jnp.maximum(chk[A_OP], 1e-12), 0.0)
                gP = galpha * alpha  # d(alpha)/d(power) = alpha (unclamped)
                dx, dy = dxs[k], dys[k]
                ca, cb2, cc = chk[A_CA], chk[A_CB], chk[A_CC]

                # depth channel: z_px = use_plane ? (p.n)/(ray.n) : p_z
                gz = g_dep * w
                rden = jnp.where(use_plane, 1.0 / denom_safe, 0.0)
                g_pn = gz * rden
                g_den = -g_pn * pn * rden
                gz_fb = jnp.where(use_plane, 0.0, gz)

                red_ins[k] = [
                    gP * (ca * dx + cb2 * dy),            # g_u
                    gP * (cb2 * dx + cc * dy),            # g_v
                    gP * (-0.5 * dx * dx),                # g_ca
                    gP * (-dx * dy),                      # g_cb
                    gP * (-0.5 * dy * dy),                # g_cc
                    galpha * expp,                        # g_op (VAL applied below)
                    g_r * w,                              # g_cr
                    g_g * w,                              # g_cg
                    g_b * w,                              # g_cb_col
                    g_nx * w + g_pn * chk[A_PX] + g_den * rx,  # g_nx_e
                    g_ny * w + g_pn * chk[A_PY] + g_den * ry,  # g_ny_e
                    g_nz * w + g_pn * chk[A_PZ] + g_den,       # g_nz_e
                    g_pn * nxs,                           # g_px
                    g_pn * nys,                           # g_py
                    g_pn * nzs + gz_fb,                   # g_pz
                ]

                B = B + w * A

            cols = []
            for j in range(15):
                st = jnp.concatenate([red_ins[k][j] for k in range(CHUNK)], axis=0)
                cols.append(jnp.sum(st.reshape(CHUNK, TILE_H * TILE_W), axis=1))
            # g_op carries the entry-valid factor (rows past count -> 0)
            cols[5] = cols[5] * ch[:, A_VAL]
            cols.append(jnp.zeros((CHUNK,), jnp.float32))
            dent_ref[0, pl.ds(ci * CHUNK, CHUNK), :] = jnp.stack(cols, axis=1)
            return (ci - 1, B)

        def cond2(carry):
            return carry[0] >= 0

        # suffix init: the g_T cotangent enters every galpha as
        # -g_T*T_fin/(1-a) — exactly a B seeded with g_T*T_fin
        jax.lax.while_loop(cond2, body2, (n_done - 1, g_T * T_fin))

    return kernel


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_geom_composite(hp: int, wp: int, cap: int, n_tiles: int, interpret: bool):
    """Forward-only depth+opacity compositor (no VJP, no color/normal)."""
    tx_tiles = wp // TILE_W
    img = lambda: jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    blk1 = lambda: pl.BlockSpec((TILE_H, TILE_W), lambda t: (t // tx_tiles, t % tx_tiles), memory_space=pltpu.VMEM)
    counts_spec = pl.BlockSpec((n_tiles, 1), lambda t: (0, 0), memory_space=pltpu.SMEM)
    intr_spec = pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM)
    entries_spec = pl.BlockSpec((1, cap, N_ATTR), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_kernel(tx_tiles, cap, geom=True),
        grid=(n_tiles,),
        in_specs=[counts_spec, intr_spec, entries_spec],
        out_specs=(blk1(), blk1(), blk1()),
        out_shape=(img(), img(), img()),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _make_composite(hp: int, wp: int, cap: int, n_tiles: int, interpret: bool):
    tx_tiles = wp // TILE_W

    img = lambda c: jax.ShapeDtypeStruct((c, hp, wp), jnp.float32) if c else jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    blk3 = lambda: pl.BlockSpec((3, TILE_H, TILE_W), lambda t: (0, t // tx_tiles, t % tx_tiles), memory_space=pltpu.VMEM)
    blk1 = lambda: pl.BlockSpec((TILE_H, TILE_W), lambda t: (t // tx_tiles, t % tx_tiles), memory_space=pltpu.VMEM)
    counts_spec = pl.BlockSpec((n_tiles, 1), lambda t: (0, 0), memory_space=pltpu.SMEM)
    intr_spec = pl.BlockSpec((1, 4), lambda t: (0, 0), memory_space=pltpu.SMEM)
    entries_spec = pl.BlockSpec((1, cap, N_ATTR), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)

    fwd_call = pl.pallas_call(
        _make_fwd_kernel(tx_tiles, cap),
        grid=(n_tiles,),
        in_specs=[counts_spec, intr_spec, entries_spec],
        out_specs=(blk3(), blk3(), blk1(), blk1(), blk1()),
        out_shape=(img(3), img(3), img(0), img(0), img(0)),
        interpret=interpret,
    )

    # backward: per-chunk T checkpoints live in a ~1 MB VMEM scratch, rebuilt
    # by an alpha-only phase-1 re-sweep inside the kernel (see module notes)
    bwd_call = pl.pallas_call(
        _make_bwd_kernel(tx_tiles, cap),
        grid=(n_tiles,),
        in_specs=[counts_spec, intr_spec, entries_spec, blk3(), blk3(), blk1(), blk1(), blk1(),
                  blk1()],
        out_specs=pl.BlockSpec((1, cap, N_ATTR), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, cap, N_ATTR), jnp.float32),
        scratch_shapes=[pltpu.VMEM(((cap // CHUNK) * TILE_H, TILE_W), jnp.float32)],
        interpret=interpret,
    )

    @jax.custom_vjp
    def composite(entries, counts, intr):
        return fwd_call(counts, intr.reshape(1, 4), entries)

    def composite_fwd(entries, counts, intr):
        rgb, nrm, dep, opa, T = fwd_call(counts, intr.reshape(1, 4), entries)
        return (rgb, nrm, dep, opa, T), (entries, counts, intr, T)

    def composite_bwd(res, cots):
        entries, counts, intr, T_fin = res
        g_rgb, g_nrm, g_dep, g_opa, g_T = cots
        d_entries = bwd_call(
            counts, intr.reshape(1, 4), entries, g_rgb, g_nrm, g_dep, g_opa, g_T,
            T_fin,
        )
        zero_i = np.zeros(counts.shape, jax.dtypes.float0)
        return d_entries, zero_i, jnp.zeros_like(intr)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


# --------------------------------------------------------------------------
# binning (XLA, non-differentiable)
# --------------------------------------------------------------------------


DEPTH_BITS = 21
DEPTH_FAR = 120.0  # quantization range upper bound (m)


def _bin_entries(depth, mean2d, radius, valid, n_tiles, tx_tiles, ty_tiles, cap,
                 need_back: bool = True):
    """Fixed-window tile binning via ONE fused (tile, depth) radix key.

    The CUDA rasterizer builds 64-bit keys (tile << 32 | float_bits(depth))
    and radix-sorts the duplicated entries. Here: uint32 keys
    (tile << 21 | quantized_depth), one `lax.sort` with the candidate index
    as payload, and one inverse sort — no depth pre-sort, no scatters, and
    (unlike naive argsort+gather chains) only two O(N*K) sorts total.

    Returns:
      entry_sid (T, CAP) i32 — ORIGINAL surfel index per entry slot
      counts    (T, 1)   i32
      back_map  (N, K)   i32 — flat entry slot (tile*cap + slot) of each
                 surfel's k-th candidate, or -1 if culled/overflowed. This is
                 the exact inverse of the expansion: the custom-VJP backward
                 gathers through it instead of letting XLA emit a serialized
                 scatter-add transpose (the TPU-killer of naive autodiff
                 through the gather). `need_back=False` (forward-only
                 renders) skips the inverse sort that builds it (~1/2 of the
                 binning sort cost) and returns None.
    """
    n = mean2d.shape[-1]
    u = mean2d[0]
    v = mean2d[1]
    r = radius
    ry = jnp.minimum(r, BIN_RADIUS_MAX_Y)  # keep the y-span within KY rows
    tx0 = jnp.clip(jnp.floor((u - r) / TILE_W).astype(jnp.int32), 0, tx_tiles - 1)
    ty0 = jnp.clip(jnp.floor((v - ry) / TILE_H).astype(jnp.int32), 0, ty_tiles - 1)
    tx1 = jnp.clip(jnp.floor((u + r) / TILE_W).astype(jnp.int32), 0, tx_tiles - 1)
    ty1 = jnp.clip(jnp.floor((v + ry) / TILE_H).astype(jnp.int32), 0, ty_tiles - 1)
    # truncate footprint to the fixed window
    tx1 = jnp.minimum(tx1, tx0 + KX - 1)
    ty1 = jnp.minimum(ty1, ty0 + KY - 1)

    qmax = (1 << DEPTH_BITS) - 1
    qdepth = jnp.clip(depth * (qmax / DEPTH_FAR), 0, qmax).astype(jnp.uint32)

    K = KX * KY
    assert n_tiles < (1 << 10), "tile id must fit the uint32 key budget"
    keys = []
    for ky in range(KY):
        for kx in range(KX):
            tx = tx0 + kx
            ty = ty0 + ky
            ok = valid & (tx <= tx1) & (ty <= ty1)
            tile = jnp.where(ok, ty * tx_tiles + tx, n_tiles).astype(jnp.uint32)
            keys.append((tile << DEPTH_BITS) | qdepth)
    keys = jnp.stack(keys, axis=-1).reshape(-1)  # (N*K,) surfel-major

    nk = n * K
    iota = jnp.arange(nk, dtype=jnp.int32)
    skeys, sorted_j = jax.lax.sort((keys, iota), num_keys=1)
    sorted_tile = (skeys >> DEPTH_BITS).astype(jnp.int32)
    sorted_sid = sorted_j // K  # ORIGINAL surfel index (candidates surfel-major)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = jnp.minimum(ends - starts, cap)

    pos = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    entry_sid = sorted_sid[jnp.clip(pos, 0, nk - 1)]

    if not need_back:
        return entry_sid, counts[:, None], None

    # Per-sorted-position tile slot WITHOUT gathering starts per candidate
    # (starts[tile_of_candidate] is an N*K random gather from a tiny table —
    # ~37 ms at 600k surfels on v5e; the cummax segment-start scan is ~1 ms):
    # a position's segment start is the last position where the tile id
    # changed, so slot = pos - cummax(pos * is_boundary).
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_tile[1:] != sorted_tile[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    slot_sorted = iota - seg_start
    flat_sorted = jnp.where(
        (sorted_tile < n_tiles) & (slot_sorted < cap),
        sorted_tile * cap + slot_sorted,
        -1,
    )
    # inverse permutation: sorting sorted_j back to iota carries each entry's
    # flat slot to its candidate position (payload ride-along, no extra gather)
    _, back_flat = jax.lax.sort((sorted_j, flat_sorted), num_keys=1)
    back_map = back_flat.reshape(n, K)  # (N, K), original order
    return entry_sid, counts[:, None], back_map


@jax.custom_vjp
def _expand_entries(attrs, entry_sid, back_map):
    """Gather per-surfel attrs (N, 16) into per-tile slabs (T, CAP, 16).

    Backward gathers d(entries) through `back_map` — each surfel collects its
    <= K entry-slot gradients. No scatter ops anywhere.
    """
    return attrs[entry_sid]


def _expand_fwd(attrs, entry_sid, back_map):
    return attrs[entry_sid], (entry_sid.shape, back_map)


def _expand_bwd(res, g):
    sid_shape, back_map = res
    flat = g.reshape(-1, g.shape[-1])  # (T*CAP, 16)
    idx = jnp.clip(back_map, 0, flat.shape[0] - 1)  # (N, K)
    picked = flat[idx]  # (N, K, 16)
    d_attrs = jnp.sum(jnp.where((back_map >= 0)[..., None], picked, 0.0), axis=1)
    return (
        d_attrs,
        np.zeros(sid_shape, jax.dtypes.float0),
        np.zeros(back_map.shape, jax.dtypes.float0),
    )


_expand_entries.defvjp(_expand_fwd, _expand_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


class Binning(NamedTuple):
    """Per-camera tile-binning artifact (non-differentiable).

    Computable once and reused across several optimization steps on the same
    camera: positions move by ~lr per Adam step (1e-5 m), orders of magnitude
    below a tile, while the two N*K-key sorts that build this are ~22 ms per
    render at 600k capacity."""

    entry_sid: jnp.ndarray  # (T, CAP) i32
    counts: jnp.ndarray  # (T, 1) i32
    back_map: jnp.ndarray  # (N, K) i32


def n_tiles_static(width: int, height: int) -> int:
    """Number of compositor tiles for an image size (static)."""
    return _cdiv(width, TILE_W) * _cdiv(height, TILE_H)


def tile_pixel_mask(keep: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Expand a per-tile keep mask (n_tiles,) to a per-pixel (H, W) bool mask.

    Matches the tile layout of the compositor (row-major over the padded
    image). Used by tile-subset stochastic map optimization: the loss must
    only read pixels of tiles that were actually composited.
    """
    tx = _cdiv(width, TILE_W)
    ty = _cdiv(height, TILE_H)
    m = keep.reshape(ty, 1, tx, 1)
    m = jnp.broadcast_to(m, (ty, TILE_H, tx, TILE_W)).reshape(ty * TILE_H, tx * TILE_W)
    return m[:height, :width]


@functools.partial(jax.jit, static_argnames=("width", "height", "cap"))
def compute_binning(params: dict, w2c, intr, width: int, height: int, cap: int = 512) -> Binning:
    """Standalone tile binning for `render_pallas(..., binning=...)`."""
    hp = _cdiv(height, TILE_H) * TILE_H
    wp = _cdiv(width, TILE_W) * TILE_W
    tx_tiles = wp // TILE_W
    ty_tiles = hp // TILE_H
    proj = rc.project_surfels(
        jax.lax.stop_gradient(params), w2c, intr, width, height, sh_degree=0
    )
    entry_sid, counts, back_map = _bin_entries(
        proj.depth, proj.mean2d, proj.radius, proj.valid,
        tx_tiles * ty_tiles, tx_tiles, ty_tiles, cap,
    )
    return Binning(entry_sid, counts, back_map)


@functools.partial(jax.jit, static_argnames=("width", "height", "sh_degree", "cap", "interpret", "geom_only", "need_grad"))
def _render_pallas_jit(params: dict, w2c, intr, width: int, height: int,
                       sh_degree: int, cap: int, interpret: bool,
                       binning: Binning | None = None, geom_only: bool = False,
                       need_grad: bool = True, tile_keep: jnp.ndarray | None = None) -> dict:
    hp = _cdiv(height, TILE_H) * TILE_H
    wp = _cdiv(width, TILE_W) * TILE_W
    tx_tiles = wp // TILE_W
    ty_tiles = hp // TILE_H
    n_tiles = tx_tiles * ty_tiles

    proj = rc.project_surfels(params, w2c, intr, width, height, sh_degree,
                              need_color=not geom_only)

    if binning is not None:
        entry_sid, counts, back_map = binning
    else:
        entry_sid, counts, back_map = _bin_entries(
            jax.lax.stop_gradient(proj.depth),
            jax.lax.stop_gradient(proj.mean2d),
            jax.lax.stop_gradient(proj.radius),
            proj.valid,
            n_tiles, tx_tiles, ty_tiles, cap,
            need_back=need_grad and not geom_only,
        )

    # pack transposed (16, N), then ONE (16, N) -> (N, 16) relayout — the
    # only row-layout boundary left (the per-tile slab gather wants rows)
    attrs = jnp.concatenate(
        [
            proj.mean2d,  # u, v (2, N)
            proj.conic,  # a, b, c (3, N)
            proj.opacity[None],
            proj.color,
            proj.normal_cam,
            proj.p_cam,
            jnp.ones((1, proj.mean2d.shape[-1]), jnp.float32),  # val (masked below)
        ],
        axis=0,
    ).T  # (N, 16)

    if tile_keep is not None:
        # tile-subset render (stochastic map optimization): dropped tiles get
        # count 0 — their compositor instances exit immediately (forward AND
        # backward), so the kernel cost scales with the kept fraction. Their
        # pixels come back zero; pair with `tile_pixel_mask` in the loss.
        counts = jnp.where(tile_keep[:, None], counts, 0)

    if back_map is None:  # forward-only render: plain gather, no custom VJP
        entries = attrs[entry_sid]
    else:
        entries = _expand_entries(attrs, entry_sid, back_map)  # (T, CAP, 16)
    # rows past a tile's count can be read by its LAST 8-entry chunk: zero
    # their A_VAL so their alpha vanishes (other lanes can stay garbage)
    entry_valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts
    entries = entries.at[..., A_VAL].set(entry_valid.astype(jnp.float32))

    if geom_only:
        composite = _make_geom_composite(hp, wp, cap, n_tiles, interpret)
        dep, opa, _T = composite(counts, intr.astype(jnp.float32).reshape(1, 4), entries)
        dep = dep[:height, :width]
        opa = opa[:height, :width]
        wsum = jnp.maximum(opa, 1e-6)
        return {"depth": (dep / wsum)[..., None], "opacity": opa[..., None]}

    composite = _make_composite(hp, wp, cap, n_tiles, interpret)
    rgb, nrm, dep, opa, _T = composite(entries, counts, intr.astype(jnp.float32))

    rgb = jnp.moveaxis(rgb, 0, -1)[:height, :width, :]
    nrm = jnp.moveaxis(nrm, 0, -1)[:height, :width, :]
    dep = dep[:height, :width]
    opa = opa[:height, :width]

    # identical normalization to raster_xla (see its depth-bias note)
    wsum = jnp.maximum(opa, 1e-6)
    dep = dep / wsum
    nrm = nrm / wsum[..., None]

    return {
        "color": rgb,
        "normal": nrm,
        "depth": dep[..., None],
        "opacity": opa[..., None],
    }


def render_pallas(params: dict, w2c: jnp.ndarray, intr: jnp.ndarray, width: int, height: int,
                  sh_degree: int = 3, cap: int = 512, interpret: bool | None = None,
                  binning: Binning | None = None, geom_only: bool = False,
                  need_grad: bool = True, tile_keep: jnp.ndarray | None = None) -> dict:
    """Render surfels to (H, W, *) color/normal/depth/opacity maps.

    Drop-in for `raster_xla.render_xla`; same output dict and normalization.
    Pass a `Binning` from `compute_binning` to reuse tile assignments across
    several optimization steps on the same camera. `geom_only=True` returns
    only {depth, opacity} and skips SH + color/normal compositing (the
    fusion/spawn render needs nothing else). `need_grad=False` (forward-only
    renders: tracking model views, fusion/spawn) skips building the
    gradient back-map — one of the two N*K-key binning sorts. `tile_keep`
    ((n_tiles,) bool) composites only the kept tiles (see `tile_pixel_mask`).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _render_pallas_jit(params, w2c, intr, width, height, sh_degree, cap, interpret,
                              binning, geom_only, need_grad, tile_keep)

"""Pallas TPU tile-based differentiable surfel rasterizer.

TPU-native replacement for the reference's CUDA `diff_gaussian_rasterization`
submodule (interface contract at `/root/reference/src/core/render.py:53-104`):
given camera + surfel render params, produce (color, normal, depth, opacity)
images with gradients. Numerics match the golden XLA compositor
(`ops/raster_xla.py`); this kernel replaces its O(N*H*W) all-pairs blend with
the classic splatting pipeline, re-shaped for TPU:

  1. project (XLA, differentiable) — shared `raster_common.project_surfels`.
  2. depth-sort surfels once, globally (XLA argsort).
  3. sub-column binning (XLA, non-diff): each surfel emits up to KSUB*KY
     candidate (sub-column, surfel) entries from a fixed window anchored at
     its bbox corner; a single sort by fused (subtile, depth) key yields
     per-sub-column contiguous, depth-ordered entry runs (fixed candidate
     count replaces the CUDA variable-length duplication + radix sort).
  4. per-tile gather of a fixed-capacity (CAP) entry slab: (T, CAP, 16)
     attribute array, rows interleaving the tile's 4 sub-columns.
     Differentiable gather — the backward is the segment-sum XLA generates
     for free.
  5. Pallas compositing kernel: grid over tiles, each instance front-to-back
     alpha-blends its slab over a TILE_H x TILE_W pixel block (lane-aligned),
     processing entries in 8-row chunks (one VMEM row-block load + static
     unroll amortizes the dynamic-slice overhead), sweeping exactly to the
     deepest sub-column's slot count (transmittance-exit gates measurably
     never fire on fused SLAM maps — see EXIT_MODE).
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

Sub-column striping (the key capacity/throughput trick): the compositor
tile is 32x128 pixels (VPU-shaped), but binning and capacity are per 32-px
SUB-COLUMN (4 per tile). Each sweep step loads one slot-GROUP — the k-th
entry of all 4 sub-columns — expands it to lane vectors (each entry's
attributes broadcast over its own 32-lane stripe via one tiny matmul), and
composites all 4 in the SAME (32, 128) vector op. A pixel only ever sees
entries binned to its own sub-column, so per-pixel sweep depth is CAP/4
while per-tile capacity stays CAP: 4x the effective coverage of tile-wide
binning at the same instruction count. (With tile-wide binning, overflow
keeps the nearest CAP entries of the WHOLE tile; in dense maps — 600k
surfels is ~80x overdraw — those cluster on the near-depth side of the
tile and the far-side pixels render EMPTY, which the mapper then
misreads as uncovered space and floods with new spawns.)

Deviations from the CUDA rasterizer (documented, not accidental):
  * tiles are 32x128 pixels (VPU-shaped), not 16x16 (warp-shaped); binning
    granularity is the 32x32-px sub-column.
  * a surfel's footprint is truncated to a KSUB*KY sub-column window
    (64x64 px; binning radius clamped to 15.5 px horizontally / 31.5 px
    vertically); splats larger than that are rare in fused SLAM maps
    (scale ~ 2px*d/f).
  * per-sub-column entry capacity CAP/4 is static; overflow drops the
    FARTHEST surfels (entries are depth-sorted per sub-column, and a
    sub-column that deep is saturated).
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

# Tile height trades early-exit granularity vs per-instance overhead;
# TILE_H=16 measured slower than 32 at equal cap on v5e (more grid
# instances). Overridable for experiments via env.
TILE_H = int(_os.environ.get("EGG_RASTER_TILE_H", 32))
TILE_W = 128
# Binning/capacity sub-column width (stripe of the lane dim), experiment
# knob. Narrower stripes cut per-pixel sweep depth ~0.6x (a pixel only
# composites entries binned to its own sub-column) while each sweep step
# still composites one entry per stripe — but they are NOT a free win:
# per-sub-column capacity is cap/N_SUB, so at equal total cap the overflow
# pressure DOUBLES (measured: the 10-layer production-density test loses
# 4% coverage at SUB_W 16 / cap 2048), and the guaranteed-coverage radius
# (KSUB-1)*SUB_W/2 shrinks unless KSUB grows (which grows the binning
# sort by K/4). Holding depth needs cap 4096, whose slab-expand gather
# cancels the sweep savings. Default 32 is the measured sweet spot.
SUB_W = int(_os.environ.get("EGG_RASTER_SUB_W", 32))
N_SUB = TILE_W // SUB_W  # stripes per tile
# candidate window, x, in SUB-COLUMNS: chosen so the guaranteed-coverage
# radius (KSUB-1)*SUB_W/2 stays 16 px at any stripe width (narrower stripes
# emit more candidates per surfel; the binning sort length scales with K)
KSUB = {32: 2, 16: 3, 8: 5}.get(SUB_W, 2)
KY = 2  # candidate window, y, in tile rows (2*TILE_H px). Binning sort cost
#         AND the backward's back_map gather scale with KSUB*KY, so the
#         window is the single biggest rasterizer cost knob.
# binning-extent clamps (px): alpha is NOT clamped — a splat larger than the
# window just truncates to it (same policy both axes)
BIN_RADIUS_MAX_X = (KSUB * SUB_W - 1) / 2
BIN_RADIUS_MAX_Y = (KY * TILE_H - 1) / 2
CHUNK = int(_os.environ.get("EGG_RASTER_CHUNK", 16))  # slot-GROUPS per VMEM row-block
#            load (rows = CHUNK*N_SUB; also the backward checkpoint period,
#            in slots). 16 measured ~1 ms faster than 8 on the production
#            full-coverage fwd render (fewer loop iterations, same bwd).
STOP_EPS = float(_os.environ.get("EGG_STOP_EPS", 1e-4))  # transmittance early-exit threshold
# Sweep-exit mode. "count" (default, round 5): the loop runs exactly to the
# deepest sub-column's slot count with NO transmittance check. Measured on
# the production 135k-surfel map (1280x704, v5e): the classic 3DGS
# max(T) <= eps exit NEVER fires — a fused SLAM map's per-pixel overdraw
# (~6 layers at alpha ~0.6) never drives a whole 32x32 stripe below eps
# (identical depth output at eps = 1e-4 AND 0.02) — while evaluating the
# gate costs 1.4-1.5 ms per render (a lane+sublane max-reduce per chunk).
# The per-pixel exit the CUDA rasterizer relies on has no lockstep-vector
# equivalent; dropping the dead gate makes the sweep EXACT (no truncated
# contributions). "stripe" (per-sub-column max(T), finest vectorizable
# granularity) and "global" (whole-block max(T)) remain as experiment knobs
# for atypically opaque scenes.
EXIT_MODE = _os.environ.get("EGG_EXIT_MODE", "count")

# entry attribute layout (lane index in the (CAP, 16) slab)
A_U, A_V = 0, 1
A_CA, A_CB, A_CC = 2, 3, 4
A_OP = 5
A_R, A_G, A_B = 6, 7, 8
A_NX, A_NY, A_NZ = 9, 10, 11
A_PX, A_PY, A_PZ = 12, 13, 14
A_VAL = 15  # padding lane (VMEM tile alignment); validity now comes from the
#             SMEM counts inside the kernels (`_lane_counts`)
N_ATTR = 16


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _chunk_for(cap: int) -> int:
    """Effective slot-group chunk: CHUNK, clamped so tiny caps (tests, the
    multichip dryrun's occupancy-sized slabs) stay a whole number of
    chunks."""
    return min(CHUNK, max(1, cap // N_SUB))


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


def _stripe_sel():
    """(N_SUB, TILE_W) 0/1 selector: S[c, j] = 1 iff lane j is in stripe c."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (N_SUB, TILE_W), 1) // SUB_W
    sub = jax.lax.broadcasted_iota(jnp.int32, (N_SUB, TILE_W), 0)
    return (lane == sub).astype(jnp.float32)


def _stripe_attrs(cg, S):
    """Expand one slot-group (N_SUB, 16) to lane vectors (16, TILE_W).

    Row a holds attribute a of each lane's OWN sub-column entry — one tiny
    matmul against the stripe selector replaces 4 scalar broadcasts, and
    every downstream (TILE_H, TILE_W) op then composites 4 entries at once,
    each confined to its 32-lane stripe."""
    return jax.lax.dot_general(
        cg, S, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _group_alpha(attrs, xs, ys, vmask):
    """Alpha map (TILE_H, TILE_W) of one striped slot-group (16, TILE_W).

    `vmask` ((1, TILE_W) f32) zeroes lanes whose sub-column has fewer than
    this group's slot count — computed from the SMEM counts inside the
    kernel (round 4), replacing the A_VAL slab lane whose materialization
    cost a full (T, CAP, 16) rewrite per render."""
    dx = xs - attrs[A_U : A_U + 1, :]
    dy = ys - attrs[A_V : A_V + 1, :]
    ca = attrs[A_CA : A_CA + 1, :]
    cb = attrs[A_CB : A_CB + 1, :]
    cc = attrs[A_CC : A_CC + 1, :]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = attrs[A_OP : A_OP + 1, :] * jnp.exp(power)
    alpha = jnp.minimum(rc.MAX_ALPHA, raw) * vmask
    return jnp.where(alpha >= rc.ALPHA_EPS, alpha, 0.0), raw, dx, dy


def _lane_counts(counts_ref, t):
    """(1, TILE_W) i32: each lane's own sub-column slot count (SMEM reads)."""
    lane_sub = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1) // SUB_W
    cnt = jnp.zeros((1, TILE_W), jnp.int32)
    for c in range(N_SUB):
        cnt = jnp.where(lane_sub == c, counts_ref[t, c], cnt)
    return cnt


def _stripe_live(i, T, counts_ref, t, capsub, chunk):
    """Sweep-continuation predicate (see EXIT_MODE).

    "count": run to the deepest sub-column's slot count, no transmittance
    gate — the measured winner on production maps (the gate never fires but
    costs 1.4-1.5 ms/render to evaluate; see EXIT_MODE notes). "stripe":
    additionally stop once every sub-column's own 32 lanes saturate
    (max T <= STOP_EPS) or exhaust their count — the finest granularity a
    lockstep vector sweep can exit at. "global": whole-block max(T), the
    3DGS-style gate."""
    count = counts_ref[t, 0]
    for c in range(1, N_SUB):
        count = jnp.maximum(count, counts_ref[t, c])
    in_count = i * chunk < jnp.minimum(count, capsub)
    if EXIT_MODE == "count":
        return in_count
    if EXIT_MODE == "global":
        return in_count & (jnp.max(T) > STOP_EPS)
    live = None
    for c in range(N_SUB):
        n_c = jnp.minimum(counts_ref[t, c], capsub)
        Tc = jnp.max(T[:, c * SUB_W : (c + 1) * SUB_W])
        lc = (i * chunk < n_c) & (Tc > STOP_EPS)
        live = lc if live is None else live | lc
    return live


def _group_zpx(attrs, rx, ry):
    """Per-pixel ray/surfel-plane depth of one striped slot-group (matches
    raster_xla)."""
    nx = attrs[A_NX : A_NX + 1, :]
    ny = attrs[A_NY : A_NY + 1, :]
    nz = attrs[A_NZ : A_NZ + 1, :]
    px = attrs[A_PX : A_PX + 1, :]
    py = attrs[A_PY : A_PY + 1, :]
    pz = attrs[A_PZ : A_PZ + 1, :]
    denom = rx * nx + ry * ny + nz
    pn = px * nx + py * ny + pz * nz
    denom_ok = jnp.abs(denom) >= 1e-6
    denom_safe = jnp.where(denom_ok, denom, 1e-6)
    z_plane = pn / denom_safe
    use_plane = (z_plane > rc.NEAR_Z) & denom_ok
    z_fb = jnp.broadcast_to(pz, z_plane.shape)
    return jnp.where(use_plane, z_plane, z_fb), denom_safe, pn, use_plane


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _make_fwd_kernel(tx_tiles: int, cap: int, geom: bool = False):
    """Forward striped compositor.

    `geom` composites only depth + opacity (no color/normal accumulation) —
    the per-frame fusion/spawn render (`core.mapper.map_update`) reads only
    those two channels, and dropping the other six halves the per-entry
    FMA work."""
    capsub = cap // N_SUB
    chunk = _chunk_for(cap)
    rows = chunk * N_SUB  # slab rows per chunk

    def kernel(counts_ref, intr_ref, entries_ref, *out_refs):
        if geom:
            dep_ref, opa_ref, T_ref = out_refs[:3]
        else:
            rgb_ref, nrm_ref, dep_ref, opa_ref, T_ref = out_refs[:5]
        t = pl.program_id(0)
        xs, ys, rx, ry = _pixel_grid(t, tx_tiles, intr_ref)
        S = _stripe_sel()
        cnt_lanes = _lane_counts(counts_ref, t)
        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)

        # chunked: one (CHUNK*N_SUB, 16) row-block load + static unroll per
        # chunk amortizes the dynamic-slice overhead; each unrolled step
        # composites one slot-GROUP (4 striped entries) in one vector op.
        # Rows past a sub-column's count are masked to alpha 0 via cnt_lanes.
        # Continuation is per STRIPE (`_stripe_live`): each sub-column stops
        # counting once its own entries run out or its own lanes saturate.
        def cond(carry):
            i = carry[0]
            T = carry[-1]
            return _stripe_live(i, T, counts_ref, t, capsub, chunk)

        def body(carry):
            if geom:
                i, dep, opa, T = carry
            else:
                i, r, g, b, nx, ny, nz, dep, opa, T = carry
            ch = entries_ref[0, pl.ds(i * rows, rows), :]
            for k in range(chunk):
                attrs = _stripe_attrs(ch[N_SUB * k : N_SUB * (k + 1), :], S)
                vmask = (i * chunk + k < cnt_lanes).astype(jnp.float32)
                alpha, _, _, _ = _group_alpha(attrs, xs, ys, vmask)
                z_px, _, _, _ = _group_zpx(attrs, rx, ry)
                w = T * alpha
                if not geom:
                    r = r + w * attrs[A_R : A_R + 1, :]
                    g = g + w * attrs[A_G : A_G + 1, :]
                    b = b + w * attrs[A_B : A_B + 1, :]
                    nx = nx + w * attrs[A_NX : A_NX + 1, :]
                    ny = ny + w * attrs[A_NY : A_NY + 1, :]
                    nz = nz + w * attrs[A_NZ : A_NZ + 1, :]
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
    capsub = cap // N_SUB
    chunk = _chunk_for(cap)
    rows = chunk * N_SUB

    def kernel(
        counts_ref, intr_ref, entries_ref,
        g_rgb_ref, g_nrm_ref, g_dep_ref, g_opa_ref, g_T_ref,
        T_fin_ref,  # final transmittance (the forward's 5th output)
        dent_ref,
        T_ckpt,  # VMEM scratch: (n_chunks_max*TILE_H, TILE_W) chunk-start T
    ):
        t = pl.program_id(0)
        xs, ys, rx, ry = _pixel_grid(t, tx_tiles, intr_ref)
        S = _stripe_sel()
        cnt_lanes = _lane_counts(counts_ref, t)
        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)

        dent_ref[0, :, :] = jnp.zeros((cap, N_ATTR), jnp.float32)

        # ---- phase 1: alpha-only forward re-sweep -> VMEM checkpoints ------
        # Same loop structure (incl. the per-stripe early-exit predicate) as
        # the forward kernel, so `n_done` and every chunk-start T match the
        # forward run bit-for-bit. ~256 KB of scratch; never touches HBM (an
        # earlier revision shipped these checkpoints through a forward
        # output, a ~220 MB HBM round trip per render at 220 tiles — slower
        # than this recompute, which is alpha-only: no channel accumulation).
        def cond1(carry):
            i, T = carry
            return _stripe_live(i, T, counts_ref, t, capsub, chunk)

        def body1(carry):
            i, T = carry
            T_ckpt[pl.ds(i * TILE_H, TILE_H), :] = T
            ch = entries_ref[0, pl.ds(i * rows, rows), :]
            for k in range(chunk):
                attrs = _stripe_attrs(ch[N_SUB * k : N_SUB * (k + 1), :], S)
                vmask = (i * chunk + k < cnt_lanes).astype(jnp.float32)
                alpha, _, _, _ = _group_alpha(attrs, xs, ys, vmask)
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
        # updates and the nine-term recombination. B is per-pixel, and each
        # pixel only ever sees its own stripe's entries, so one suffix image
        # serves all 4 stripes.
        #
        # The 15 per-entry scalar gradients are reduced PER CHUNK, not per
        # entry (per-entry jnp.sum was the kernel's bottleneck): the chunk's
        # CHUNK group-images per attribute collapse with two constant-matrix
        # matmuls — C (rows, CHUNK*TILE_H) picks each group's sublane block,
        # the stripe mask + ones-vector matmul sums each row's own 32-lane
        # stripe. All 2-D ops (Mosaic-friendly), MXU-cheap.
        C_pick = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, chunk * TILE_H), 1) // TILE_H
            == jax.lax.broadcasted_iota(jnp.int32, (rows, chunk * TILE_H), 0) // N_SUB
        ).astype(jnp.float32)
        SM_rows = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, TILE_W), 1) // SUB_W
            == jax.lax.broadcasted_iota(jnp.int32, (rows, TILE_W), 0) % N_SUB
        ).astype(jnp.float32)
        ones_w = jnp.ones((TILE_W, 1), jnp.float32)

        def _reduce_chunk(red_ins, j):
            st = jnp.concatenate([red_ins[k][j] for k in range(chunk)], axis=0)
            X = jax.lax.dot_general(
                C_pick, st, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, TILE_W): row r = group r//N_SUB's sublane-summed image
            return jax.lax.dot_general(
                X * SM_rows, ones_w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, 1): row r = sum over stripe r%N_SUB

        def body2(carry):
            ci, B = carry
            ch = entries_ref[0, pl.ds(ci * rows, rows), :]
            Tc = T_ckpt[pl.ds(ci * TILE_H, TILE_H), :]

            attrss, alphas, raws, dxs, dys, zpxs, zaux, Ts = [], [], [], [], [], [], [], []
            T = Tc
            for k in range(chunk):
                attrs = _stripe_attrs(ch[N_SUB * k : N_SUB * (k + 1), :], S)
                vmask = (ci * chunk + k < cnt_lanes).astype(jnp.float32)
                alpha, raw, dx, dy = _group_alpha(attrs, xs, ys, vmask)
                z_px, denom_safe, pn, use_plane = _group_zpx(attrs, rx, ry)
                attrss.append(attrs)
                alphas.append(alpha); raws.append(raw); dxs.append(dx); dys.append(dy)
                zpxs.append(z_px); zaux.append((denom_safe, pn, use_plane)); Ts.append(T)
                T = T * (1.0 - alpha)

            red_ins = [None] * chunk  # per group: list of 15 reduction images
            for k in reversed(range(chunk)):
                alpha = alphas[k]
                Tk = Ts[k]
                w = Tk * alpha
                inv1m = 1.0 / (1.0 - alpha)
                z_px = zpxs[k]
                denom_safe, pn, use_plane = zaux[k]
                attrs = attrss[k]

                cr = attrs[A_R : A_R + 1, :]
                cg = attrs[A_G : A_G + 1, :]
                cb = attrs[A_B : A_B + 1, :]
                nxs = attrs[A_NX : A_NX + 1, :]
                nys = attrs[A_NY : A_NY + 1, :]
                nzs = attrs[A_NZ : A_NZ + 1, :]

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
                expp = jnp.where(
                    live, raws[k] / jnp.maximum(attrs[A_OP : A_OP + 1, :], 1e-12), 0.0
                )
                gP = galpha * alpha  # d(alpha)/d(power) = alpha (unclamped)
                dx, dy = dxs[k], dys[k]
                ca = attrs[A_CA : A_CA + 1, :]
                cb2 = attrs[A_CB : A_CB + 1, :]
                cc = attrs[A_CC : A_CC + 1, :]

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
                    g_nx * w + g_pn * attrs[A_PX : A_PX + 1, :] + g_den * rx,  # g_nx_e
                    g_ny * w + g_pn * attrs[A_PY : A_PY + 1, :] + g_den * ry,  # g_ny_e
                    g_nz * w + g_pn * attrs[A_PZ : A_PZ + 1, :] + g_den,       # g_nz_e
                    g_pn * nxs,                           # g_px
                    g_pn * nys,                           # g_py
                    g_pn * nzs + gz_fb,                   # g_pz
                ]

                B = B + w * A

            # invalid rows (slot >= count) already produce zero gradients:
            # their vmask-zeroed alpha gates galpha through `live`, and every
            # other column is weighted by w = T * alpha = 0
            cols = [_reduce_chunk(red_ins, j) for j in range(15)]
            cols.append(jnp.zeros((rows, 1), jnp.float32))
            dent_ref[0, pl.ds(ci * rows, rows), :] = jnp.concatenate(cols, axis=1)
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
    counts_spec = pl.BlockSpec((n_tiles, N_SUB), lambda t: (0, 0), memory_space=pltpu.SMEM)
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
    counts_spec = pl.BlockSpec((n_tiles, N_SUB), lambda t: (0, 0), memory_space=pltpu.SMEM)
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
        scratch_shapes=[
            pltpu.VMEM(((cap // (N_SUB * _chunk_for(cap))) * TILE_H, TILE_W), jnp.float32)
        ],
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


DEPTH_BITS = 19  # 0.23 mm buckets over [0, DEPTH_FAR); 13 bits of subtile id
DEPTH_FAR = 120.0  # quantization range upper bound (m)
# stratified-tail overflow: beyond the nearest 3/4*capsub entries of a
# sub-column, keep every TAIL_STRIDE-th entry (see _bin_entries)
TAIL_STRIDE = 4


def _bin_entries(depth, mean2d, radius, valid, n_tiles, tx_tiles, ty_tiles, cap,
                 need_back: bool = True):
    """Fixed-window SUB-COLUMN binning via ONE fused (subtile, depth) key.

    The CUDA rasterizer builds 64-bit keys (tile << 32 | float_bits(depth))
    and radix-sorts the duplicated entries. Here: uint32 keys
    (subtile << 19 | quantized_depth) where subtile = tile * N_SUB + 32-px
    sub-column, one `lax.sort` with the candidate index as payload, and one
    inverse sort — no depth pre-sort, no scatters, and (unlike naive
    argsort+gather chains) only two O(N*K) sorts total. Capacity is
    cap/N_SUB per sub-column; slab rows interleave sub-columns
    (row = slot * N_SUB + subcol) so the compositor loads one slot-GROUP
    per step.

    Returns:
      entry_sid (T, CAP) i32 — ORIGINAL surfel index per slab row
      counts    (T, N_SUB) i32 — per-sub-column slot counts
      back_map  (N, K)   i32 — flat slab row (tile*cap + slot*N_SUB + subcol)
                 of each surfel's k-th candidate, or -1 if culled/overflowed.
                 This is the exact inverse of the expansion: the custom-VJP
                 backward gathers through it instead of letting XLA emit a
                 serialized scatter-add transpose (the TPU-killer of naive
                 autodiff through the gather). `need_back=False`
                 (forward-only renders) skips the inverse sort that builds
                 it (~1/2 of the binning sort cost) and returns None.
      max_run   () i32 — the TRUE (pre-stratification, pre-clip) deepest
                 sub-column candidate count: the occupancy signal the
                 adaptive model-render cap policy reads (`core.mapper`).
    """
    n = mean2d.shape[-1]
    capsub = cap // N_SUB
    n_sub = n_tiles * N_SUB
    sx_tiles = tx_tiles * N_SUB  # sub-columns per image row
    u = mean2d[0]
    v = mean2d[1]
    rx = jnp.minimum(radius, BIN_RADIUS_MAX_X)  # keep x-span within KSUB cols
    ry = jnp.minimum(radius, BIN_RADIUS_MAX_Y)  # keep y-span within KY rows
    sx0 = jnp.clip(jnp.floor((u - rx) / SUB_W).astype(jnp.int32), 0, sx_tiles - 1)
    ty0 = jnp.clip(jnp.floor((v - ry) / TILE_H).astype(jnp.int32), 0, ty_tiles - 1)
    sx1 = jnp.clip(jnp.floor((u + rx) / SUB_W).astype(jnp.int32), 0, sx_tiles - 1)
    ty1 = jnp.clip(jnp.floor((v + ry) / TILE_H).astype(jnp.int32), 0, ty_tiles - 1)
    # truncate footprint to the fixed window
    sx1 = jnp.minimum(sx1, sx0 + KSUB - 1)
    ty1 = jnp.minimum(ty1, ty0 + KY - 1)

    qmax = (1 << DEPTH_BITS) - 1
    qdepth = jnp.clip(depth * (qmax / DEPTH_FAR), 0, qmax).astype(jnp.uint32)

    K = KSUB * KY
    assert n_sub < (1 << (32 - DEPTH_BITS)), "subtile id must fit the key budget"
    keys = []
    for ky in range(KY):
        for kx in range(KSUB):
            sx = sx0 + kx
            ty = ty0 + ky
            ok = valid & (sx <= sx1) & (ty <= ty1)
            # subtile id = tile * N_SUB + subcol, row-major over tiles
            tile = ty * tx_tiles + sx // N_SUB
            subtile = jnp.where(ok, tile * N_SUB + sx % N_SUB, n_sub).astype(jnp.uint32)
            keys.append((subtile << DEPTH_BITS) | qdepth)
    keys = jnp.stack(keys, axis=-1).reshape(-1)  # (N*K,) surfel-major

    nk = n * K
    iota = jnp.arange(nk, dtype=jnp.int32)
    skeys, sorted_j = jax.lax.sort((keys, iota), num_keys=1)
    sorted_sub = (skeys >> DEPTH_BITS).astype(jnp.int32)
    sorted_sid = sorted_j // K  # ORIGINAL surfel index (candidates surfel-major)

    sub_ids = jnp.arange(n_sub, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_sub, sub_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_sub, sub_ids, side="right").astype(jnp.int32)
    run = ends - starts

    # Stratified-tail overflow (round 3): pure drop-farthest loses ALL far
    # coverage in depth-mixing sub-columns (receding floors: one 32x32 bin
    # spans a huge depth range, the near entries monopolize the cap and the
    # far part of the bin renders EMPTY). Keep the nearest TAIL_NEAR slots
    # exactly, then every TAIL_STRIDE-th entry of the remainder — far
    # surfaces degrade to sparser splats instead of holes. Closed-form slot
    # mapping, no extra sorts; depth order within a sub-column is preserved,
    # so front-to-back compositing stays correct.
    near = capsub * 3 // 4
    kept_tail = jnp.maximum(run - near, 0)
    kept = jnp.minimum(
        jnp.minimum(run, near) + -(-kept_tail // TAIL_STRIDE), capsub
    )
    counts = kept.reshape(n_tiles, N_SUB).astype(jnp.int32)
    max_run = jnp.max(run).astype(jnp.int32)  # true occupancy (pre-clip)

    # slab slot k reads sorted position starts + off(k)
    off_np = np.arange(capsub, dtype=np.int32)
    off_np = np.where(off_np < near, off_np, near + (off_np - near) * TAIL_STRIDE)
    pos = starts.reshape(n_tiles, 1, N_SUB) + jnp.asarray(off_np).reshape(1, capsub, 1)
    entry_sid = sorted_sid[jnp.clip(pos.reshape(n_tiles, cap), 0, nk - 1)]

    if not need_back:
        return entry_sid, counts, None, max_run

    # Per-sorted-position sub-column slot WITHOUT gathering starts per
    # candidate (starts[sub_of_candidate] is an N*K random gather from a tiny
    # table — ~37 ms at 600k surfels on v5e; the cummax segment-start scan is
    # ~1 ms): a position's segment start is the last position where the
    # subtile id changed, so slot = pos - cummax(pos * is_boundary).
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_sub[1:] != sorted_sub[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    slot_sorted = iota - seg_start
    # invert the stratified-tail slot mapping: run offset -> slab slot
    # (dropped tail entries get -1 -> no gradient, matching the forward)
    tail = slot_sorted - near
    tail_kept = (tail >= 0) & (tail % TAIL_STRIDE == 0)
    slab_slot = jnp.where(tail < 0, slot_sorted, near + tail // TAIL_STRIDE)
    slot_ok = (tail < 0) | tail_kept
    flat_sorted = jnp.where(
        (sorted_sub < n_sub) & slot_ok & (slab_slot < capsub),
        (sorted_sub // N_SUB) * cap + slab_slot * N_SUB + sorted_sub % N_SUB,
        -1,
    )
    # inverse permutation: sorting sorted_j back to iota carries each entry's
    # flat slot to its candidate position (payload ride-along, no extra gather)
    _, back_flat = jax.lax.sort((sorted_j, flat_sorted), num_keys=1)
    back_map = back_flat.reshape(n, K)  # (N, K), original order
    return entry_sid, counts, back_map, max_run


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

    entry_sid: jnp.ndarray  # (T, CAP) i32, rows interleave sub-columns
    counts: jnp.ndarray  # (T, N_SUB) i32 per-sub-column slot counts
    back_map: jnp.ndarray  # (N, K) i32


def n_tiles_static(width: int, height: int) -> int:
    """Number of compositor tiles for an image size (static)."""
    return _cdiv(width, TILE_W) * _cdiv(height, TILE_H)


# Frustum compaction for FORWARD-only renders — implemented, measured, and
# DISABLED by default (round 5): compacting in-frustum surfels to a
# half-capacity prefix before projection/binning was the named mitigation
# for the 1M/3M O(capacity) wall, but the measured end-to-end effect at a
# live 1M map was NEGATIVE (presized envelope median 65 -> 88 ms): the
# per-field column gathers on the transposed (k, N) SoA cost more than the
# halved projection/binning save, and the frame's remaining O(N) costs
# (the GRADIENT path's projection/back-map/Adam, fusion's winner sort)
# are untouched by a forward-only compaction. A packed row-gather variant
# (one (N, C) relayout + one V-row gather) prices out marginal. Kept as an
# env knob for experiments; the honest 3M lever is compacting the
# OPTIMIZATION path, which needs a gradient scatter-back design.
FRUSTUM_COMPACT_MIN = int(_os.environ.get("EGG_FRUSTUM_COMPACT_MIN", 1 << 30))


def _frustum_compact(params: dict, w2c, intr, width: int, height: int):
    """Compact in-frustum surfels to the first V = N/2 columns.

    Returns a V-column params dict. Ordering inside the prefix is by depth
    (a beneficial side effect: the binning sort keys arrive nearly
    depth-sorted). Culled/overflow columns park at the back and are marked
    inactive."""
    xyz = params["xyz"]
    n = xyz.shape[-1]
    V = n // 2
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    p_cam = R @ xyz + t[:, None]
    z = p_cam[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = fx * p_cam[0] / z_safe + cx
    v = fy * p_cam[1] / z_safe + cy
    # conservative margin: binning clamps splat extents to ~32 px anyway
    m = 2 * BIN_RADIUS_MAX_Y + 1
    inb = (z > rc.NEAR_Z) & (u > -m) & (u < width + m) & (v > -m) & (v < height + m)
    keep = inb & params["active"]
    qmax = (1 << DEPTH_BITS) - 1
    qd = jnp.clip(z * (qmax / DEPTH_FAR), 0, qmax).astype(jnp.uint32)
    key = jnp.where(keep, qd, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)[:V]
    sel = lambda x: jnp.take(x, order, axis=-1)
    out = {k: sel(v) for k, v in params.items()}
    # culled columns gathered into the prefix tail (overflow only) must not
    # render: re-derive active from the kept mask
    out["active"] = jnp.take(keep, order, axis=-1)
    return out


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
    entry_sid, counts, back_map, _ = _bin_entries(
        proj.depth, proj.mean2d, proj.radius, proj.valid,
        tx_tiles * ty_tiles, tx_tiles, ty_tiles, cap,
    )
    return Binning(entry_sid, counts, back_map)


@functools.partial(jax.jit, static_argnames=("width", "height", "sh_degree", "cap", "interpret", "geom_only", "need_grad", "with_occupancy"))
def _render_pallas_jit(params: dict, w2c, intr, width: int, height: int,
                       sh_degree: int, cap: int, interpret: bool,
                       binning: Binning | None = None, geom_only: bool = False,
                       need_grad: bool = True, tile_keep: jnp.ndarray | None = None,
                       with_occupancy: bool = False) -> dict:
    assert cap % (N_SUB * _chunk_for(cap)) == 0, (
        f"cap must be a multiple of {N_SUB * _chunk_for(cap)} (sub-column slot chunks)"
    )
    hp = _cdiv(height, TILE_H) * TILE_H
    wp = _cdiv(width, TILE_W) * TILE_W
    tx_tiles = wp // TILE_W
    ty_tiles = hp // TILE_H
    n_tiles = tx_tiles * ty_tiles

    if (not need_grad and binning is None
            and params["xyz"].shape[-1] >= FRUSTUM_COMPACT_MIN):
        params = _frustum_compact(params, w2c, intr, width, height)

    proj = rc.project_surfels(params, w2c, intr, width, height, sh_degree,
                              need_color=not geom_only)

    max_run = None
    if binning is not None:
        entry_sid, counts, back_map = binning
    else:
        entry_sid, counts, back_map, max_run = _bin_entries(
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
            jnp.ones((1, proj.mean2d.shape[-1]), jnp.float32),  # pad lane (A_VAL)
        ],
        axis=0,
    ).T  # (N, 16)

    if tile_keep is not None:
        # tile-subset render (stochastic map optimization): dropped tiles get
        # count 0 — their compositor instances exit immediately (forward AND
        # backward), so the kernel cost scales with the kept fraction. Their
        # pixels come back zero; pair with `tile_pixel_mask` in the loss.
        counts = jnp.where(tile_keep[:, None], counts, 0)  # (T, N_SUB)

    if back_map is None:  # forward-only render: plain gather, no custom VJP
        entries = attrs[entry_sid]
    else:
        entries = _expand_entries(attrs, entry_sid, back_map)  # (T, CAP, 16)
    # rows past a sub-column's count are still read by the lockstep sweep;
    # the kernels zero their alpha from the SMEM counts (`_lane_counts`) —
    # no per-slab validity rewrite (round 4: the A_VAL `.at[].set` was a
    # full (T, CAP, 16) materialization per render)

    if with_occupancy:
        assert max_run is not None, "with_occupancy requires in-call binning"

    if geom_only:
        composite = _make_geom_composite(hp, wp, cap, n_tiles, interpret)
        dep, opa, _T = composite(counts, intr.astype(jnp.float32).reshape(1, 4), entries)
        dep = dep[:height, :width]
        opa = opa[:height, :width]
        wsum = jnp.maximum(opa, 1e-6)
        out = {"depth": (dep / wsum)[..., None], "opacity": opa[..., None]}
        if with_occupancy:
            out["max_occupancy"] = max_run
        return out

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

    out = {
        "color": rgb,
        "normal": nrm,
        "depth": dep[..., None],
        "opacity": opa[..., None],
    }
    if with_occupancy:
        out["max_occupancy"] = max_run
    return out


def render_pallas(params: dict, w2c: jnp.ndarray, intr: jnp.ndarray, width: int, height: int,
                  sh_degree: int = 3, cap: int = 512, interpret: bool | None = None,
                  binning: Binning | None = None, geom_only: bool = False,
                  need_grad: bool = True, tile_keep: jnp.ndarray | None = None,
                  with_occupancy: bool = False) -> dict:
    """Render surfels to (H, W, *) color/normal/depth/opacity maps.

    Drop-in for `raster_xla.render_xla`; same output dict and normalization.
    Pass a `Binning` from `compute_binning` to reuse tile assignments across
    several optimization steps on the same camera. `geom_only=True` returns
    only {depth, opacity} and skips SH + color/normal compositing (the
    fusion/spawn render needs nothing else). `need_grad=False` (forward-only
    renders: tracking model views, fusion/spawn) skips building the
    gradient back-map — one of the two N*K-key binning sorts. `tile_keep`
    ((n_tiles,) bool) composites only the kept tiles (see `tile_pixel_mask`).
    `with_occupancy=True` adds "max_occupancy" — the true (pre-clip) deepest
    sub-column candidate count, the adaptive model-cap signal.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _render_pallas_jit(params, w2c, intr, width, height, sh_degree, cap, interpret,
                              binning, geom_only, need_grad, tile_keep, with_occupancy)

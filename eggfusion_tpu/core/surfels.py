"""Gaussian-surfel map: a static-capacity structure-of-arrays pytree.

TPU-native redesign of the reference `GaussianSurfels`
(`/root/reference/src/core/gaussian_surfels.py`). The reference grows tensors
with `torch.cat` per frame (`gaussian_surfels.py:152-167`) — anathema to XLA's
static-shape compilation model. Here the map is a **fixed-capacity SoA with an
active mask and an append watermark**: spawning scatters into free slots,
deletion clears the active mask, and every per-frame program compiles exactly
once.

**Layout: every per-surfel field is stored TRANSPOSED, (k, N).** An (N, 3)
array tiles onto the TPU VPU with the 3-wide axis on the 128-lane dimension —
every elementwise op runs at 3/128 lane utilization, and column slices
relayout. Transposed (3, N) puts the surfel axis on lanes: the same chains run
~50x faster (measured: norm over (600k, 3) 1.45 ms vs 0.03 ms transposed on
v5e), rigid transforms become (3, 3) @ (3, N) MXU matmuls, and the
row-layout boundaries that remain (rasterizer attribute slabs, PLY export)
pay one cheap transpose (~0.15 ms for the whole SoA at 600k).

Field inventory matches the reference SoA (`gaussian_surfels.py:17-32`):
optimizable (xyz, features_dc, features_rest, scaling, rotation, opacity) +
probabilistic fusion state (eta, sigma2, observe_count, tic, error_count,
stable mask). `confidence` is derived: sum(1/sigma2)
(`gaussian_surfels.py:423-425`). The reference's `inview`/`surface` masks are
written but never read downstream (`mapper.py:326-334`); they are omitted
here — per-frame visibility is recomputed where needed.

Activations (`gaussian_surfels.py:48-55`): exp scaling, sigmoid opacity,
normalized quaternion. A surfel is a degenerate Gaussian: the 3rd log-scale is
pinned to a large negative value (`:186`), the quaternion rotates +z onto the
normal (`:188-189`), so the normal is the min-scale axis column of R
(`:380-391`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from eggfusion_tpu.geometry import sh as shlib
from eggfusion_tpu.geometry import transforms as tf

# exp(-30) ~ 1e-13: numerically zero thickness but finite in f32 autodiff
# (the reference's -1e10 underflows activations/gradients to 0/NaN in f32).
FLAT_LOG_SCALE = -30.0


class SurfelConfig(NamedTuple):
    """Static (hashable) surfel configuration — reference `Surfel:` section
    (`configs/replica/base.yaml:85-96`)."""

    capacity: int = 1_000_000
    max_sh_degree: int = 3
    active_sh_degree: int = 3
    init_opacity: float = 0.99
    alpha_p: float = 1.0
    alpha_n: float = 0.5
    stable_confidence: float = 10.0  # reference `mapper.py:332`


@struct.dataclass
class SurfelMap:
    """Fixed-capacity surfel SoA. All arrays have TRAILING dim = capacity."""

    xyz: jnp.ndarray  # (3, C) world position
    features_dc: jnp.ndarray  # (3, 1, C) SH DC
    features_rest: jnp.ndarray  # (3, R, C) higher SH, R = (deg+1)^2 - 1
    scaling: jnp.ndarray  # (3, C) log-scale; [2] pinned flat
    rotation: jnp.ndarray  # (4, C) unnormalized quaternion wxyz
    opacity: jnp.ndarray  # (1, C) logit opacity
    eta: jnp.ndarray  # (6, C) information vector [pos*lam_p, normal*lam_n]
    sigma2: jnp.ndarray  # (2, C) variances [sigma2_p, sigma2_n]
    observe_count: jnp.ndarray  # (C,) i32
    tic: jnp.ndarray  # (C,) i32 creation time
    error_count: jnp.ndarray  # (C,) i32
    stable: jnp.ndarray  # (C,) bool
    active: jnp.ndarray  # (C,) bool allocated & alive
    count: jnp.ndarray  # () i32 append watermark

    # ---- construction -------------------------------------------------------

    @staticmethod
    def empty(cfg: SurfelConfig) -> "SurfelMap":
        C = cfg.capacity
        R = (cfg.max_sh_degree + 1) ** 2 - 1
        f = jnp.float32
        return SurfelMap(
            xyz=jnp.zeros((3, C), f),
            features_dc=jnp.zeros((3, 1, C), f),
            features_rest=jnp.zeros((3, R, C), f),
            scaling=jnp.full((3, C), FLAT_LOG_SCALE, f),
            rotation=jnp.zeros((4, C), f).at[0].set(1.0),
            opacity=jnp.zeros((1, C), f),
            eta=jnp.zeros((6, C), f),
            sigma2=jnp.ones((2, C), f),
            observe_count=jnp.zeros((C,), jnp.int32),
            tic=jnp.zeros((C,), jnp.int32),
            error_count=jnp.zeros((C,), jnp.int32),
            stable=jnp.zeros((C,), bool),
            active=jnp.zeros((C,), bool),
            count=jnp.zeros((), jnp.int32),
        )

    # ---- derived quantities (activations) -----------------------------------

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-1]

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / (jnp.linalg.norm(self.rotation, axis=0, keepdims=True) + 1e-12)

    def get_R(self) -> jnp.ndarray:
        return tf.build_rotation_t(self.rotation)  # (3, 3, C)

    def get_normal(self) -> jnp.ndarray:
        """Column of R at the min-scale axis (reference `:380-391`) -> (3, C).

        The min-scale axis is ALWAYS index 2: `append_surfels` pins
        scaling[2] to FLAT_LOG_SCALE (-30) and no optimizer step can close
        a >25 log-unit gap, so the argmin+take_along_axis the reference does
        per call reduces to a static column — and computing just that column
        (`normal_from_quat_t`) skips 2/3 of the rotation build.
        """
        return tf.normal_from_quat_t(self.rotation)

    def get_features(self) -> jnp.ndarray:
        """(3, (deg+1)^2, C) stacked SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_radius(self) -> jnp.ndarray:
        """(sum(scales) - min(scale)) / 2 (reference `:358-362`) -> (C,)."""
        s = self.get_scaling()
        return (jnp.sum(s, axis=0) - jnp.min(s, axis=0)) / 2.0

    def get_color(self) -> jnp.ndarray:
        return shlib.sh_to_rgb(self.features_dc[:, 0, :])  # (3, C)

    def get_confidence(self) -> jnp.ndarray:
        return jnp.sum(1.0 / self.sigma2, axis=0)

    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))


class SpawnBatch(NamedTuple):
    """Fixed-size batch of candidate surfels to append (invalid rows masked).

    ROW layout (K, k): spawn batches are built from row gathers of image maps
    and are small (<= spawn_cap); `append_surfels` transposes once on entry.
    """

    xyz: jnp.ndarray  # (K, 3)
    normal: jnp.ndarray  # (K, 3)
    color: jnp.ndarray  # (K, 3)
    dist: jnp.ndarray  # (K, 3) linear scales (3rd entry ignored)
    eta: jnp.ndarray  # (K, 6)
    sigma2: jnp.ndarray  # (K, 2)
    valid: jnp.ndarray  # (K,) bool


def append_surfels(s: SurfelMap, batch: SpawnBatch, time: jnp.ndarray, init_opacity: float) -> SurfelMap:
    """Append a fixed-size spawn batch into free slots above the watermark.

    Replaces the reference's `create_surfels` + `cat` growth
    (`gaussian_surfels.py:169-222`, `:152-167`) with static shapes. Valid rows
    are compacted to the FRONT of the batch (stable argsort over ~K elements),
    then written as ONE contiguous `dynamic_update_slice` window per field:
    new slots are exactly [count, count + n_valid), so a slice-read + masked
    blend + slice-write streams sequentially — a random scatter here costs
    ~2-4 ms per field at production capacity on TPU (scatters serialize),
    ~20 ms per frame over the 14 SoA fields.
    """
    C = s.capacity
    K = batch.xyz.shape[0]
    # normal must be nonzero (reference `create_surfels` valid_mask, `:175`)
    valid = batch.valid & (jnp.sum(jnp.abs(batch.normal), axis=-1) > 1e-12)

    # compact valid rows to the front (order-preserving); a batch larger than
    # the whole map keeps its first C valid rows (drop-at-capacity policy)
    order = jnp.argsort(~valid, stable=True)
    Kw = min(K, C)

    def compact(x):
        return x[order[:Kw]]

    n_valid = jnp.minimum(jnp.sum(valid.astype(jnp.int32)), Kw)
    K = Kw

    # transpose to the map layout up front; per-surfel math below is
    # componentwise on (K,) rows
    xyz = compact(batch.xyz).T  # (3, K)
    normal = compact(batch.normal).T
    color = compact(batch.color).T
    dist = compact(batch.dist).T
    eta = compact(batch.eta).T  # (6, K)
    sigma2 = compact(batch.sigma2).T  # (2, K)

    q = tf.rot_z_to_t(normal)  # (4, K)
    scales = jnp.log(jnp.maximum(dist, 1e-12))
    scales = scales.at[2].set(FLAT_LOG_SCALE)
    dc = shlib.rgb_to_sh(color)[:, None, :]  # (3, 1, K)
    opa = tf.inverse_sigmoid(jnp.full((1, K), init_opacity, jnp.float32))

    # window start: clamp so the K-slot window fits; slots whose global index
    # lands outside [count, C) keep the old content (drop-at-capacity policy)
    start = jnp.clip(s.count, 0, C - K)
    shift = s.count - start  # how far new slot r sits into the window
    r = jnp.arange(K, dtype=jnp.int32)
    write = (r >= shift) & (r - shift < n_valid) & (start + r < C)

    def blend(dst, new):
        # align new slots to window positions along the LAST (surfel) axis:
        # window slot r <- new[r - shift]
        axis = dst.ndim - 1
        pad = jnp.zeros(new.shape[:-1] + (K,), new.dtype)
        new2 = jnp.concatenate([pad, new], axis=axis)  # slot r-shift at K-shift+r
        aligned = jax.lax.dynamic_slice_in_dim(new2, K - shift, K, axis=axis)
        old = jax.lax.dynamic_slice_in_dim(dst, start, K, axis=axis)
        m = write.reshape((1,) * axis + (K,))
        return jax.lax.dynamic_update_slice_in_dim(dst, jnp.where(m, aligned, old), start, axis=axis)

    Kz = lambda shape, dt, v: jnp.full(shape + (K,), v, dt)
    s = s.replace(
        xyz=blend(s.xyz, xyz),
        features_dc=blend(s.features_dc, dc),
        features_rest=blend(s.features_rest, jnp.zeros(s.features_rest.shape[:-1] + (K,))),
        scaling=blend(s.scaling, scales),
        rotation=blend(s.rotation, q),
        opacity=blend(s.opacity, opa),
        eta=blend(s.eta, eta),
        sigma2=blend(s.sigma2, sigma2),
        observe_count=blend(s.observe_count, Kz((), jnp.int32, 0)),
        tic=blend(s.tic, jnp.full((K,), time, jnp.int32)),
        error_count=blend(s.error_count, Kz((), jnp.int32, 0)),
        stable=blend(s.stable, Kz((), bool, False)),
        active=blend(s.active, Kz((), bool, True)),
        count=jnp.minimum(s.count + n_valid, C),
    )
    return s


@functools.partial(jax.jit, static_argnames=("new_capacity",))
def grow_surfels(s: SurfelMap, new_capacity: int) -> SurfelMap:
    """Pad every SoA array to a larger capacity bucket.

    Capacity bucketing: per-frame programs cost O(capacity) on TPU (binning
    sorts, fusion gathers, render expansion all run over the full static
    shape), so the map starts in a small bucket and grows geometrically as
    surfels accumulate — the same cost-follows-map-size behavior the
    reference gets for free from `torch.cat` growth (`gaussian_surfels.py:
    152-167`), recovered under XLA's static shapes at a bounded number of
    recompiles (one set per bucket, persistent-cached across runs).
    """
    C = s.capacity
    if new_capacity <= C:
        return s
    pad = new_capacity - C

    def ext(x, fill=0):
        if x.ndim == 0:
            return x
        p = jnp.full(x.shape[:-1] + (pad,), fill, x.dtype)
        return jnp.concatenate([x, p], axis=-1)

    return s.replace(
        xyz=ext(s.xyz),
        features_dc=ext(s.features_dc),
        features_rest=ext(s.features_rest),
        scaling=ext(s.scaling, FLAT_LOG_SCALE),
        rotation=ext(s.rotation).at[0, C:].set(1.0),
        opacity=ext(s.opacity),
        eta=ext(s.eta),
        sigma2=ext(s.sigma2, 1),
        observe_count=ext(s.observe_count),
        tic=ext(s.tic),
        error_count=ext(s.error_count),
        stable=ext(s.stable, False),
        active=ext(s.active, False),
    )


@functools.partial(jax.jit, static_argnames=("new_capacity",))
def shrink_surfels(s: SurfelMap, new_capacity: int) -> SurfelMap:
    """Slice every SoA array down to a smaller capacity bucket.

    Caller must guarantee the append watermark (`count`) fits: all written
    slots live in the prefix `[0, count)` (true right after
    `compact_surfels`, or whenever count <= new_capacity). The inverse of
    `grow_surfels` — re-earns the O(capacity) per-frame savings after
    pruning shrinks the live map."""
    if new_capacity >= s.capacity:
        return s

    def cut(x):
        if x.ndim == 0:
            return x
        return jax.lax.slice_in_dim(x, 0, new_capacity, axis=x.ndim - 1)

    return jax.tree_util.tree_map(cut, s)


def prune_surfels(s: SurfelMap, delete_mask: jnp.ndarray) -> SurfelMap:
    """Mask-based deletion (reference `delete`, `gaussian_surfels.py:58-76`).

    Slots are not compacted (static shapes); they are excluded from rendering
    and fusion via `active`. Compaction happens host-side if fragmentation
    grows (see `compact_surfels`).
    """
    return s.replace(active=s.active & ~delete_mask)


def compact_surfels(s: SurfelMap) -> SurfelMap:
    """Move all active surfels to the front (slot reclamation).

    One argsort + gather; run occasionally from the host when
    count - num_active grows large.
    """
    order = jnp.argsort(~s.active, stable=True)  # actives first, stable

    def gather(x):
        if x.ndim == 0:
            return x
        return jnp.take(x, order, axis=-1)

    num = s.num_active()
    out = jax.tree_util.tree_map(gather, s)
    return out.replace(count=num.astype(jnp.int32))


def render_params(s: SurfelMap) -> dict:
    """Derived render inputs (reference `Mapping.total_params`,
    `mapper.py:565-586`). Transposed layout: (k, C) per-surfel fields."""
    rotations = jnp.nan_to_num(s.get_rotation(), nan=1.0)
    return {
        "xyz": s.xyz,  # (3, C)
        "opacity": s.get_opacity(),  # (1, C)
        "scales": s.get_scaling(),  # (3, C)
        "rotations": rotations,  # (4, C)
        "normal": s.get_normal(),  # (3, C)
        "shs": s.get_features(),  # (3, K, C)
        "radius": s.get_radius(),  # (C,)
        "active": s.active,  # (C,)
    }


def update_stability(s: SurfelMap, threshold: float = 10.0) -> SurfelMap:
    """Promote surfels whose information confidence exceeds the threshold
    (reference `surfels_postprocess`, `mapper.py:326-334`)."""
    return s.replace(stable=(s.get_confidence() > threshold) & s.active)

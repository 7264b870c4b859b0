"""Multi-chip scaling over a `jax.sharding.Mesh`.

The reference is single-GPU (SURVEY.md §2: no DP/TP/PP, no collectives); its
only parallelism is CUDA data-parallel kernels. The honest TPU scaling axes
for this workload are:

  * `kf`  — keyframe data parallelism for map optimization: each device
            renders + differentiates a different keyframe of the batch;
            gradients are mean-reduced (XLA inserts the psum over ICI).
            This batches the reference's one-random-keyframe-per-iteration
            Adam loop (`mapper.py:351-368`) into a B-way SPMD step — B
            keyframes per step instead of 1, same expected gradient
            direction, B* less wall-clock per epoch.
  * `px`  — pixel sharding for fusion: the per-pixel association +
            segment-sum reduction shards over image rows; XLA turns the
            segment_sum into partial sums + all-reduce.

Everything uses `jax.jit` with `NamedSharding` annotations — no manual
collectives; XLA chooses reduce-scatter/all-gather placements over ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eggfusion_tpu.core import surfels as sf
from eggfusion_tpu.core.mapper import OPT_FIELDS, MapperConfig, _adam_init, _adam_update, compute_loss
from eggfusion_tpu.ops import fusion


def make_mesh(n_devices: int | None = None, axis: str = "kf") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_dp_opt_step(render_at, mcfg: MapperConfig, mesh: Mesh, sh_degree: int = 3):
    """Build the keyframe-data-parallel map-optimization step.

    Returns step(surfels, moments, step_count, kf_batch, w2c_batch, intr,
                 geo_snapshot, lrs, width, height) -> (surfels, moments,
                 step_count, loss) with kf_batch sharded over the mesh axis
    and the surfel map replicated.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("kf"))

    @functools.partial(jax.jit, static_argnames=("width", "height"))
    def step(s: sf.SurfelMap, moments, step_count, kf_batch: dict, w2c_batch, intr,
             geo_snapshot, lrs, width: int, height: int):
        kf_batch = jax.lax.with_sharding_constraint(
            kf_batch, {k: batch_sh for k in kf_batch}
        )
        w2c_batch = jax.lax.with_sharding_constraint(w2c_batch, batch_sh)
        params = {k: getattr(s, k) for k in OPT_FIELDS}

        def loss_fn(p):
            s2 = s.replace(**p)
            rp = sf.render_params(s2)

            def per_kf(kf, w2c):
                out = render_at(rp, w2c, intr, width, height)
                return compute_loss(out, kf, s2, geo_snapshot, mcfg)

            losses = jax.vmap(per_kf)(kf_batch, w2c_batch)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params, moments = _adam_update(params, grads, moments, step_count, lrs)
        s = s.replace(**new_params)
        s = jax.lax.with_sharding_constraint(s, jax.tree_util.tree_map(lambda _: repl, s))
        return s, moments, step_count + 1, loss

    return step


def make_sharded_fusion(mesh: Mesh, scfg, fusion_dist_thres: float):
    """Surfel-sharded fusion wrapper: the per-surfel gather/update shards over
    the surfel axis (frame maps replicated); XLA all-gathers only the small
    per-device stats."""
    # surfel axis is the TRAILING axis of the transposed (k, N) SoA
    surf = NamedSharding(mesh, P(None, "kf"))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def fuse(s: sf.SurfelMap, imap, w2c, intr, vertex_w, normal_w, color, depth, geo_mask, model_depth, time):
        s = s.replace(
            xyz=jax.lax.with_sharding_constraint(s.xyz, surf),
            eta=jax.lax.with_sharding_constraint(s.eta, surf),
            sigma2=jax.lax.with_sharding_constraint(s.sigma2, surf),
        )
        s2, stats = fusion.fuse_surfels(
            s, imap, w2c, intr, vertex_w, normal_w, color, depth, geo_mask, model_depth,
            fusion_dist_thres, scfg, time,
        )
        s2 = jax.lax.with_sharding_constraint(s2, jax.tree_util.tree_map(lambda _: repl, s2))
        return s2, stats

    return fuse


def run_multichip_dryrun(n_devices: int) -> None:
    """One full data-parallel mapping train step + sharded fusion on tiny
    shapes. Used by `__graft_entry__.dryrun_multichip` (driver contract)."""
    mesh = make_mesh(n_devices)
    from eggfusion_tpu.ops.raster_xla import render_xla

    scfg = sf.SurfelConfig(capacity=256, max_sh_degree=0, active_sh_degree=0)
    mcfg = MapperConfig()
    Wd, Ht = 32, 16  # rows divisible by n_devices for clean sharding
    B = n_devices

    rng = np.random.default_rng(0)
    n_sf = 128
    # seed surfels ON the measured surface (the frame below observes a z=2.0
    # plane with a 0.1 m association gate) so the sharded fusion path has
    # real work to do and the fused>0 assertion is meaningful
    xyz = np.concatenate([rng.uniform(-0.5, 0.5, (n_sf, 2)), rng.uniform(1.98, 2.02, (n_sf, 1))], -1)
    nrm = np.tile(np.array([0.0, 0.0, -1.0]), (n_sf, 1)).astype(np.float32)
    lam = np.full((n_sf, 2), 4.0, np.float32)
    batch = sf.SpawnBatch(
        xyz=jnp.asarray(xyz, jnp.float32),
        normal=jnp.asarray(nrm),
        color=jnp.asarray(rng.uniform(size=(n_sf, 3)), jnp.float32),
        dist=jnp.full((n_sf, 3), 0.05),
        eta=jnp.asarray(np.concatenate([xyz * lam[:, :1], nrm * lam[:, 1:]], -1), jnp.float32),
        sigma2=jnp.asarray(1.0 / lam),
        valid=jnp.ones(n_sf, bool),
    )
    s = sf.append_surfels(sf.SurfelMap.empty(scfg), batch, jnp.int32(0), 0.99)

    intr = jnp.asarray([24.0, 24.0, Wd / 2 - 0.5, Ht / 2 - 0.5])

    def render_at(rp, w2c, intr_, width, height):
        return render_xla(rp, w2c, intr_, width, height, sh_degree=0)

    # ---- data-parallel optimization step (kf axis) ----
    step = make_dp_opt_step(render_at, mcfg, mesh, sh_degree=0)
    kf_batch = {
        "color": jnp.asarray(rng.uniform(size=(B, Ht, Wd, 3)), jnp.float32),
        "depth": jnp.full((B, Ht, Wd, 1), 2.0),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (B, Ht, Wd, 1)),
        "rgb_mask": jnp.ones((B, Ht, Wd, 1), bool),
        "geo_mask": jnp.ones((B, Ht, Wd, 1), bool),
    }
    w2c_batch = jnp.tile(jnp.eye(4), (B, 1, 1))
    geo = {"position": s.xyz, "normal": s.get_normal()}
    lrs = {k: jnp.float32(1e-3) for k in ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")}
    params = {k: getattr(s, k) for k in ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")}
    moments = _adam_init(params)
    s, moments, cnt, loss = step(s, moments, jnp.int32(0), kf_batch, w2c_batch, intr, geo, lrs, Wd, Ht)
    assert np.isfinite(float(loss)), "dp opt step produced non-finite loss"

    # ---- pixel-sharded fusion ----
    fuse = make_sharded_fusion(mesh, scfg, 0.1)
    imap, _ = fusion.project_surfels_to_frame(s.xyz, s.active, jnp.eye(4), intr, Wd, Ht)
    vert = jnp.zeros((Ht, Wd, 3)).at[..., 2].set(2.0)
    nrmm = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (Ht, Wd, 1))
    s, stats = fuse(s, imap, jnp.eye(4), intr, vert, nrmm, kf_batch["color"][0], kf_batch["depth"][0],
                    kf_batch["geo_mask"][0], kf_batch["depth"][0], jnp.int32(1))
    jax.block_until_ready(s.xyz)
    fused = int(stats.fused_pixels)
    assert fused > 0, (
        "sharded fusion associated zero pixels — the dryrun seeds surfels on "
        "the measured surface, so fused must be nonzero"
    )
    print(f"multichip dryrun ok on {n_devices} devices: loss={float(loss):.4f}, fused={fused}")

"""Distributed rendering + training over a device mesh (shard_map).

The TPU-native replacement for the reference's tile-exchange scaling story
(SURVEY.md §2: framebuffer sharded one region per IPU tile, gaussians sliced
across the same tiles, neighbour-lattice migration one hop per frame —
src/splat/ipu_rasteriser.cpp:164-214, src/splat/edge_builder.cpp:35-84).

TPU design — one mesh axis, two roles:

  1. *Projection is data-parallel over gaussians.* Each device holds an N/D
     shard of the parameter pytree and projects it locally (MXU matmuls).
  2. *Exchange is one all_gather of compact projected splats* (12 f32 per
     gaussian — position/depth/conic/color/opacity/radius), NOT of raw
     parameters (59+ floats incl. SH): the collective rides ICI at a
     fraction of the parameter traffic, and its autodiff transpose is a
     psum_scatter, which is exactly the reduce-scatter you want for the
     backward pass.
  3. *Rasterization is spatially parallel over framebuffer tile rows.* Each
     device bins ONLY its own row strip (render/binning.py row_lo/num_rows:
     pairs for other devices' tiles are never enumerated) and rasterizes it
     with the Pallas kernel; the image comes back tile-row-sharded.

Every frame is exact — no multi-frame migration transient like the
reference's lattice (SURVEY.md §3.2 note).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.parallel.mesh import SHARD_AXIS, VIEW_AXIS
from gaussian_splat_ipu_tpu.render import binning, tile_raster
from gaussian_splat_ipu_tpu.render.projection import (ProjectedSplats,
                                                      project_gaussians)
from gaussian_splat_ipu_tpu.train import losses as loss_lib
from gaussian_splat_ipu_tpu.train import trainer
from gaussian_splat_ipu_tpu.utils.config import RasterConfig


class ShardedRenderOutput(NamedTuple):
    image: jnp.ndarray        # (H, W, 4) tile-row-sharded across the mesh
    tile_counts: jnp.ndarray  # (rows_pad * tiles_x,) i32, sharded
    overflow: jnp.ndarray     # () i32, summed over devices (replicated)
    num_pairs: jnp.ndarray    # () i32, summed over devices (replicated)
    visible: jnp.ndarray      # (N,) bool, gaussian-sharded frustum mask


# -- packed projected-splat wire format (the all_gather payload) -----------
_PACK_COLS = 12


def _pack_splats(sp: ProjectedSplats) -> jnp.ndarray:
    return jnp.concatenate([
        sp.xy, sp.depth[:, None], sp.conic, sp.color,
        sp.opacity[:, None], sp.radius,
    ], axis=-1)  # (n, 12)


def _unpack_splats(f: jnp.ndarray) -> ProjectedSplats:
    return ProjectedSplats(
        xy=f[:, 0:2], depth=f[:, 2], conic=f[:, 3:6], color=f[:, 6:9],
        opacity=f[:, 9], radius=f[:, 10:12])


def _rows_per_device(cfg: RasterConfig, num_devices: int) -> int:
    return -(-cfg.tiles_y // num_devices)


def _untile_rows(tiles: jnp.ndarray, cfg: RasterConfig,
                 rows_total: int) -> jnp.ndarray:
    """(rows_total * tiles_x, NPIX, 4) -> (H, W, 4), cropping phantom rows."""
    c = tiles.shape[-1]
    x = tiles.reshape(rows_total, cfg.tiles_x, cfg.tile_height,
                      cfg.tile_width, c)
    x = x.transpose(0, 2, 1, 3, 4).reshape(rows_total * cfg.tile_height,
                                           cfg.padded_width, c)
    return x[:cfg.image_height, :cfg.image_width]


def render_sharded(model: GaussianModel, camera: Camera, cfg: RasterConfig,
                   mesh, axis: str = SHARD_AXIS, use_pallas: bool = True,
                   pair_capacity: int | None = None,
                   xy_probe: jnp.ndarray | None = None
                   ) -> ShardedRenderOutput:
    """Render one frame across the mesh. Differentiable end-to-end.

    model must be sharded along N on `axis` (parallel.mesh.shard_model);
    camera is replicated. Returns the image sharded by tile rows. Jit with
    static cfg/mesh/axis/use_pallas/pair_capacity.

    xy_probe: optional (N, 2) zeros sharded like the model — the screen-
    space gradient probe for density control (train/densify.py): grads
    w.r.t. it are per-gaussian pixel-position gradients, and they land
    already sharded (the probe never crosses the mesh).
    """
    d = mesh.shape[axis]
    rows = _rows_per_device(cfg, d)
    nloc = rows * cfg.tiles_x
    if pair_capacity is None:
        # Per-device pair budget: an even share plus 2x imbalance slack,
        # rounded up to a chunk multiple (binning requires alignment).
        pair_capacity = max(2 * cfg.pair_capacity // d, 4 * cfg.chunk_size)
    pair_capacity = -(-pair_capacity // cfg.chunk_size) * cfg.chunk_size
    if xy_probe is None:
        xy_probe = jnp.zeros((model.num_gaussians, 2), jnp.float32)

    def shard_fn(model_shard, camera_rep, probe_shard):
        sp_local = project_gaussians(model_shard, camera_rep, cfg,
                                     xy_probe=probe_shard)
        packed = _pack_splats(sp_local)
        all_packed = jax.lax.all_gather(packed, axis, axis=0, tiled=True)
        sp = _unpack_splats(all_packed)

        row_lo = jax.lax.axis_index(axis) * rows
        binned = binning.bin_splats(sp, cfg, row_lo=row_lo, num_rows=rows,
                                    pair_capacity=pair_capacity)
        offset = row_lo * cfg.tiles_x
        if use_pallas:
            from gaussian_splat_ipu_tpu.render.kernels import rasterize
            tiles = rasterize.rasterize_tiles(binned, cfg,
                                              tile_offset=offset)
        else:
            tiles = tile_raster.rasterize_tiles_jnp(binned, cfg,
                                                    tile_offset=offset)
        counts = binned.tile_ends - binned.tile_starts
        overflow = jax.lax.psum(binned.overflow, axis)
        num_pairs = jax.lax.psum(binned.num_pairs, axis)
        return tiles, counts, overflow, num_pairs, sp_local.radius[:, 0] > 0.0

    tiles, counts, overflow, num_pairs, visible = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(), P(), P(axis)),
        check_vma=False,  # custom_vjp inside defeats the varying-axis check
    )(model, camera, xy_probe)

    image = _untile_rows(tiles, cfg, rows * d)
    return ShardedRenderOutput(image=image, tile_counts=counts,
                               overflow=overflow, num_pairs=num_pairs,
                               visible=visible)


def render_image_sharded(model, camera, cfg: RasterConfig, mesh,
                         axis: str = SHARD_AXIS, use_pallas: bool = True,
                         pair_capacity: int | None = None) -> jnp.ndarray:
    return render_sharded(model, camera, cfg, mesh, axis, use_pallas,
                          pair_capacity).image


def render_views_sharded(model: GaussianModel, cameras: Camera,
                         cfg: RasterConfig, mesh,
                         view_axis: str = VIEW_AXIS,
                         shard_axis: str = SHARD_AXIS,
                         use_pallas: bool = True,
                         pair_capacity: int | None = None) -> jnp.ndarray:
    """Render a BATCH of views over a 2D (view, shard) mesh.

    cameras: Camera pytree with a leading view dimension V (divisible by
    the view-axis size); model sharded along N on the shard axis and
    replicated across view groups. Each view group renders its slice of
    the batch (data parallelism over frames — the second classic axis,
    which the reference cannot express at all); within a group the
    gaussians/tile-rows sharding of render_sharded applies. Returns
    (V, H, W, 4), view- and tile-row-sharded. Differentiable; the
    transpose of the view-axis replication psums parameter gradients.
    """
    d = mesh.shape[shard_axis]
    rows = _rows_per_device(cfg, d)
    nloc_rows_total = rows * d
    if pair_capacity is None:
        pair_capacity = max(2 * cfg.pair_capacity // d, 4 * cfg.chunk_size)
    pair_capacity = -(-pair_capacity // cfg.chunk_size) * cfg.chunk_size
    cam_treedef = jax.tree_util.tree_structure(
        jax.tree.map(lambda x: x[0], cameras))

    def shard_fn(model_shard, cams_local_leaves):
        def one_view(cam_leaves):
            cam = jax.tree_util.tree_unflatten(cam_treedef, cam_leaves)
            sp_local = project_gaussians(model_shard, cam, cfg)
            packed = _pack_splats(sp_local)
            all_packed = jax.lax.all_gather(packed, shard_axis, axis=0,
                                            tiled=True)
            sp = _unpack_splats(all_packed)
            row_lo = jax.lax.axis_index(shard_axis) * rows
            binned = binning.bin_splats(sp, cfg, row_lo=row_lo,
                                        num_rows=rows,
                                        pair_capacity=pair_capacity)
            offset = row_lo * cfg.tiles_x
            if use_pallas:
                from gaussian_splat_ipu_tpu.render.kernels import rasterize
                return rasterize.rasterize_tiles(binned, cfg,
                                                 tile_offset=offset)
            return tile_raster.rasterize_tiles_jnp(binned, cfg,
                                                   tile_offset=offset)

        # Sequential over the local view slice: each view already uses the
        # whole shard group; parallelism across views comes from the mesh.
        return jax.lax.map(one_view, cams_local_leaves)

    cam_leaves = jax.tree_util.tree_leaves(cameras)
    tiles = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(shard_axis), P(view_axis)),
        out_specs=P(view_axis, shard_axis),
        check_vma=False,
    )(model, cam_leaves)                  # (V, T_local*d, NPIX, 4)

    return jax.vmap(lambda t: _untile_rows(t, cfg, nloc_rows_total))(tiles)


def make_view_batch_train_step(mesh, raster_cfg: RasterConfig,
                               train_cfg: trainer.TrainConfig,
                               view_axis: str = VIEW_AXIS,
                               shard_axis: str = SHARD_AXIS,
                               use_pallas: bool = True,
                               pair_capacity: int | None = None):
    """Jitted train step over a camera/target batch on a (view, shard)
    mesh: per-view losses averaged across the batch; gradient psum over
    the view axis falls out of the replication transpose."""
    tx = trainer.make_optimizer(train_cfg)

    def loss_fn(params, cameras, targets):
        images = render_views_sharded(params, cameras, raster_cfg, mesh,
                                      view_axis, shard_axis, use_pallas,
                                      pair_capacity)
        losses_v = jax.vmap(
            lambda im, tg: loss_lib.render_loss(im, tg,
                                                train_cfg.ssim_weight))(
            images, targets)
        return jnp.mean(losses_v)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: trainer.TrainState, cameras, targets):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, cameras,
                                                  targets)
        params, opt_state = trainer.apply_param_updates(
            tx, state.params, grads, state.opt_state)
        return trainer.TrainState(params=params, opt_state=opt_state,
                                  step=state.step + 1), loss

    return step


def make_sharded_densify_train_step(mesh, raster_cfg: RasterConfig,
                                    train_cfg: trainer.TrainConfig,
                                    axis: str = SHARD_AXIS,
                                    use_pallas: bool = True,
                                    pair_capacity: int | None = None):
    """Distributed train step with density-control statistics.

    step(state, dstate, camera, target) -> (state, dstate, loss): the
    sharded analogue of train.densify.make_train_step — screen gradients
    come from a zero probe that is sharded like the model, so the stats
    accumulate shard-locally with no extra collectives. Between-event
    surgery (train.densify.densify_and_prune / reset_opacity) runs on the
    sharded state directly under jit: the rank-and-scatter is global over
    the slot buffer, and GSPMD inserts the collectives it needs (events
    are rare, every densify_every steps).
    """
    from gaussian_splat_ipu_tpu.train import densify as densify_lib

    tx = trainer.make_optimizer(train_cfg)
    half_wh = jnp.array([0.5 * raster_cfg.image_width,
                         0.5 * raster_cfg.image_height], jnp.float32)

    def loss_fn(params, probe, camera, target):
        out = render_sharded(params, camera, raster_cfg, mesh, axis,
                             use_pallas, pair_capacity, xy_probe=probe)
        return (loss_lib.render_loss(out.image, target,
                                     train_cfg.ssim_weight), out.visible)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(state: trainer.TrainState, dstate, camera: Camera,
             target: jnp.ndarray):
        probe = jnp.zeros((state.params.num_gaussians, 2), jnp.float32)
        (loss, visible), (grads, gxy) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, probe, camera, target)
        gnorm = jnp.linalg.norm(gxy * half_wh[None, :], axis=-1)
        dstate = densify_lib.DensifyState(
            grad_sum=dstate.grad_sum + jnp.where(visible, gnorm, 0.0),
            vis_count=dstate.vis_count + visible.astype(jnp.int32),
            alive=dstate.alive, key=dstate.key)

        params, opt_state = trainer.apply_param_updates(
            tx, state.params, grads, state.opt_state)
        return trainer.TrainState(params=params, opt_state=opt_state,
                                  step=state.step + 1), dstate, loss

    return step


def make_sharded_train_step(mesh, raster_cfg: RasterConfig,
                            train_cfg: trainer.TrainConfig,
                            axis: str = SHARD_AXIS, use_pallas: bool = True,
                            pair_capacity: int | None = None):
    """Build a jitted distributed train step.

    Collectives: the forward all_gathers compact projected splats; its
    autodiff transpose reduce-scatters splat gradients back to the owning
    shard, so parameter gradients land already sharded — there is no
    separate gradient all-reduce to schedule (the overlap the north star
    asks for falls out of XLA's latency-hiding scheduler on the
    reduce_scatter).
    """
    tx = trainer.make_optimizer(train_cfg)

    def loss_fn(params, camera, target):
        image = render_image_sharded(params, camera, raster_cfg, mesh, axis,
                                     use_pallas, pair_capacity)
        return loss_lib.render_loss(image, target, train_cfg.ssim_weight)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: trainer.TrainState, camera: Camera,
             target: jnp.ndarray):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, camera,
                                                  target)
        params, opt_state = trainer.apply_param_updates(
            tx, state.params, grads, state.opt_state)
        return trainer.TrainState(params=params, opt_state=opt_state,
                                  step=state.step + 1), loss

    return step

"""Sub-stage timing of bin_splats at 1280x720 on the real TPU."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_splat_ipu_tpu.io.scene import load_scene
from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.render import binning
from gaussian_splat_ipu_tpu.render.projection import project_gaussians
from gaussian_splat_ipu_tpu.utils.config import RasterConfig
from gaussian_splat_ipu_tpu.utils.profiling import two_point_time

scene = load_scene("/root/reference/data/point_cloud_12.ply")
model = scene.model
cfg = RasterConfig(image_width=1280, image_height=720)
fov = float(np.radians(40.0))
B = binning


def stage_fn(stage):
    def body(acc, ang):
        cam = Camera.orbit(scene.bb_min, scene.bb_max, fov, 16 / 9,
                           rot_y_deg=ang)
        splats = project_gaussians(model, cam, cfg)
        n = splats.xy.shape[0]
        p = cfg.pair_capacity
        ntx = cfg.tiles_x
        num_tiles = cfg.num_tiles

        x0, y0, nx, ny = B.tile_ranges_of(splats, cfg, 0, cfg.tiles_y)
        ncov = (nx * ny).astype(jnp.int32)
        if stage == "ranges":
            return acc + ncov.sum().astype(jnp.float32), None

        ncov_ext = jnp.concatenate([ncov, jnp.array([p], jnp.int32)])
        ends_cum = jnp.cumsum(ncov_ext)
        offsets_ext = ends_cum - ncov_ext
        total = ends_cum[-2]
        first_slot = jnp.where(ncov_ext > 0, offsets_ext, p)
        iota_n = jnp.arange(n + 1, dtype=jnp.int32)
        gid_at = jnp.zeros((p,), jnp.int32).at[first_slot].max(
            iota_n, mode="drop")
        gid = jax.lax.cummax(gid_at)
        seg_at = jnp.zeros((p,), jnp.int32).at[first_slot].max(
            jnp.minimum(first_slot, p - 1), mode="drop")
        slot = jnp.arange(p, dtype=jnp.int32)
        rank = slot - jax.lax.cummax(seg_at)
        is_pad = gid >= n
        g = jnp.minimum(gid, n - 1)
        if stage == "expand":
            return acc + (gid.sum() + rank.sum()).astype(jnp.float32), None

        geom = jnp.where(ncov > 0, x0 | (y0 << 12) | (nx << 24), 0)
        geom_g = geom[g]
        gx0 = geom_g & 0xFFF
        gy0 = (geom_g >> 12) & 0xFFF
        gnx = jnp.maximum(geom_g >> 24, 1)
        ty_off = jnp.floor(rank.astype(jnp.float32)
                           / gnx.astype(jnp.float32)).astype(jnp.int32)
        tx = gx0 + rank - ty_off * gnx
        ty = gy0 + ty_off
        pad_tile = jnp.int32(1 << 30)
        tile = jnp.where(is_pad, pad_tile, ty * ntx + tx)
        if stage == "tileid":
            return acc + tile.sum().astype(jnp.float32), None

        body_feats = jnp.concatenate([
            splats.xy, splats.conic, splats.color,
            splats.opacity[:, None], splats.depth[:, None],
        ], axis=-1)
        packed = jnp.concatenate(
            [body_feats, jnp.zeros((1, B.NUM_FEATURES), jnp.float32)])
        gid_pre = jnp.where(is_pad, n, gid)
        if stage == "pack":
            return acc + packed.sum() + gid_pre.sum().astype(jnp.float32), \
                None

        tile_bits = (num_tiles + 1).bit_length()
        feats, tile_s, gid_s = B._fused_sorted_feature_table(
            packed, tile, gid_pre, jnp.int32(31 - tile_bits))
        if stage == "sort":
            return acc + feats.sum() + tile_s.sum().astype(jnp.float32), \
                None

        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(tile_s, tids, side="left")
        ends = jnp.searchsorted(tile_s, tids, side="right")
        return acc + (ends - starts).sum().astype(jnp.float32), None

    def fn(angles):
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), angles)
        return acc
    return jax.jit(fn)


for stage in ["ranges", "expand", "tileid", "pack", "sort", "csr"]:
    jf = stage_fn(stage)

    def run_k(k, jf=jf):
        ang = jnp.linspace(0.0, 360.0, k, dtype=jnp.float32)
        float(jf(ang))

    dt = two_point_time(run_k, 1, 31)
    print(f"{stage:8s}: {dt*1e3:7.2f} ms/frame", flush=True)

# Also: actual pair demand.
cam = Camera.orbit(scene.bb_min, scene.bb_max, fov, 16 / 9, rot_y_deg=0.0)
sp = project_gaussians(model, cam, cfg)
b = binning.bin_splats(sp, cfg)
print("num_pairs:", int(b.num_pairs), "overflow:", int(b.overflow))

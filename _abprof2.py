"""A/B at 1M gaussians / P=2^22: carried-columns sort vs post-sort gather,
plus a no-sort control to isolate sort cost."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_splat_ipu_tpu.models.camera import Camera
from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
from gaussian_splat_ipu_tpu.render import binning
from gaussian_splat_ipu_tpu.render.projection import project_gaussians
from gaussian_splat_ipu_tpu.utils.config import RasterConfig
from gaussian_splat_ipu_tpu.utils.profiling import two_point_time

B = binning
N = 1_000_000
model = GaussianModel.random(jax.random.PRNGKey(0), N, extent=1.0)
bb = np.array([1.0, 1.0, 1.0], np.float32)
fov = float(np.radians(40.0))
cfg = RasterConfig(image_width=1280, image_height=720,
                   pair_capacity=1 << 22)
P = cfg.pair_capacity


def sort_carried(packed, tile, gid_pre, db):
    table = packed[gid_pre]
    is_pad = gid_pre >= packed.shape[0] - 1
    depth_bits = jax.lax.bitcast_convert_type(table[:, B.FEAT_DEPTH],
                                              jnp.int32)
    key = jnp.where(is_pad, jnp.int32(0x7FFFFFFF),
                    (tile << db) | (depth_bits >> (jnp.int32(31) - db)))
    cols = [table[:, i] for i in range(B.NUM_FEATURES)]
    out = jax.lax.sort(tuple([key, gid_pre] + cols), num_keys=1)
    return jnp.stack(out[2:], axis=0), out[0] >> db, out[1]


def sort_gather(packed, tile, gid_pre, db):
    is_pad = gid_pre >= packed.shape[0] - 1
    depth_bits = jax.lax.bitcast_convert_type(
        packed[:, B.FEAT_DEPTH][gid_pre], jnp.int32)
    key = jnp.where(is_pad, jnp.int32(0x7FFFFFFF),
                    (tile << db) | (depth_bits >> (jnp.int32(31) - db)))
    key_s, gid_s = jax.lax.sort((key, gid_pre), num_keys=1)
    table = packed[gid_s]
    return table.T, key_s >> db, gid_s


def sort_none(packed, tile, gid_pre, db):
    table = packed[gid_pre]
    return table.T, tile, gid_pre


VARIANTS = {"carried": sort_carried, "gather": sort_gather,
            "nosort": sort_none}


def make(variant):
    fn = VARIANTS[variant]

    def body(acc, ang):
        cam = Camera.orbit(-bb, bb, fov, 16 / 9, rot_y_deg=ang)
        splats = project_gaussians(model, cam, cfg)
        n = N
        ntx = cfg.tiles_x
        x0, y0, nx, ny = B.tile_ranges_of(splats, cfg, 0, cfg.tiles_y)
        ncov = (nx * ny).astype(jnp.int32)
        ncov_ext = jnp.concatenate([ncov, jnp.array([P], jnp.int32)])
        ends_cum = jnp.cumsum(ncov_ext)
        offsets_ext = ends_cum - ncov_ext
        first_slot = jnp.where(ncov_ext > 0, offsets_ext, P)
        iota_n = jnp.arange(n + 1, dtype=jnp.int32)
        gid_at = jnp.zeros((P,), jnp.int32).at[first_slot].max(
            iota_n, mode="drop")
        gid = jax.lax.cummax(gid_at)
        slot = jnp.arange(P, dtype=jnp.int32)
        rank = slot - offsets_ext[gid]
        is_pad = gid >= n
        g = jnp.minimum(gid, n - 1)
        geom = jnp.where(ncov > 0, x0 | (y0 << 12) | (nx << 24), 0)
        geom_g = geom[g]
        gx0 = geom_g & 0xFFF
        gy0 = (geom_g >> 12) & 0xFFF
        gnx = jnp.maximum(geom_g >> 24, 1)
        ty_off = jnp.floor(rank.astype(jnp.float32)
                           / gnx.astype(jnp.float32)).astype(jnp.int32)
        tx = gx0 + rank - ty_off * gnx
        ty = gy0 + ty_off
        tile = jnp.where(is_pad, jnp.int32(1 << 30), ty * ntx + tx)
        bodyf = jnp.concatenate([
            splats.xy, splats.conic, splats.color,
            splats.opacity[:, None], splats.depth[:, None]], axis=-1)
        packed = jnp.concatenate(
            [bodyf, jnp.zeros((1, B.NUM_FEATURES), jnp.float32)])
        gid_pre = jnp.where(is_pad, n, gid)
        db = jnp.int32(31 - (cfg.num_tiles + 1).bit_length())
        feats, tile_s, gid_s = fn(packed, tile, gid_pre, db)
        return acc + feats.sum() + (tile_s.sum() + gid_s.sum()).astype(
            jnp.float32), None

    def f(angles):
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), angles)
        return acc
    return jax.jit(f)


for rep in range(2):
    for v in VARIANTS:
        jf = make(v)

        def run_k(k, jf=jf):
            ang = jnp.linspace(0.0, 360.0, k, dtype=jnp.float32)
            float(jf(ang))

        dt = two_point_time(run_k, 1, 7)
        print(f"P=2^22 {v:8s} rep{rep}: {dt*1e3:7.2f} ms", flush=True)

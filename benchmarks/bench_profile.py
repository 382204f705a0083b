"""Stage-level breakdown of the frame at a given scale.

Round-4 answer (v5e, 1M gaussians, tight 3.88M-pair capacity): project
0.8 ms | project+bin 77.9 ms | +rasterize 80.6 ms — **binning is ~95% of
the frame**; rasterize is ~2.8 ms (early termination works). Within
binning the fixed bench_sort (DCE-proof) shows the 12-operand radix sort
is only ~5 ms/2^20 pairs (~19 ms at 3.88M) while the (P, 13) expansion
row GATHER costs ~11 ms/2^20 rows (~42 ms at 3.88M) — the gather, not
the sort, is the wall (the pre-r3 "sort wall" analysis was built on
DCE'd microbenchmarks and is retracted; see BASELINE.md round-4).

This times the pipeline cumulatively (project; +bin; +rasterize;
+untile) and the binning internals in isolation (expansion scans;
gather+sort; CSR searchsorted), all with the two-point chained-scan
method (utils/profiling.py rationale: per-frame host sync through the
axon tunnel measures ~40 ms of transfer latency instead of the device).

Run on the real chip:  python benchmarks/bench_profile.py [n] [cap_log2]
"""

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1280, 720


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.render import binning
    from gaussian_splat_ipu_tpu.render.pipeline import render, _untile_crop
    from gaussian_splat_ipu_tpu.render.projection import project_gaussians
    from gaussian_splat_ipu_tpu.render.kernels import rasterize
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    cap_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    # Optional binning-config overrides so the profile can be taken at the
    # production config (e.g. GSPLAT_TILE_GROUP=2 GSPLAT_PAIR_CAP=2305536).
    tile_group = int(os.environ.get("GSPLAT_TILE_GROUP", "1"))
    cap = int(os.environ.get("GSPLAT_PAIR_CAP", str(1 << cap_log2)))
    relaxed = os.environ.get("GSPLAT_RELAXED", "") == "1"
    tiletest = os.environ.get("GSPLAT_TILETEST", "") == "1"
    xgather = os.environ.get("GSPLAT_XGATHER", "") == "1"
    print("devices:", jax.devices(), flush=True)
    model = GaussianModel.random(jax.random.PRNGKey(0), n, extent=1.0)
    bb = np.array([1.0, 1.0, 1.0], np.float32)
    fov = float(np.radians(40.0))
    cfg = RasterConfig(image_width=WIDTH, image_height=HEIGHT,
                       pair_capacity=-(-cap // 128) * 128,
                       tile_group=tile_group,
                       strict_termination=not relaxed,
                       exact_tile_test=tiletest,
                       expand_kernel=not xgather)
    print(f"config: tile_group={tile_group} pair_capacity="
          f"{cfg.pair_capacity} strict={not relaxed} tt={tiletest} "
          f"expand_kernel={not xgather}", flush=True)

    def cam_of(a):
        return Camera.orbit(-bb, bb, fov, WIDTH / HEIGHT, rot_y_deg=a)

    def timed(name, fn, *args, k1=1, k2=6, reps=3):
        """fn(angle_f32, *args) -> scalar f32; angle varies per iteration
        so chained frames aren't degenerate."""
        def chain(k):
            @jax.jit
            def run(args):
                def body(c, i):
                    return c + fn(c * 1e-20 + i, *args), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                    jnp.arange(k, dtype=jnp.float32))
                return c
            return run

        j1, j2 = chain(k1), chain(k2)
        float(j1(args)), float(j2(args))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(j1(args))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(j2(args))
            t2 = time.perf_counter() - t0
            best = min(best, (t2 - t1) / (k2 - k1))
        print(f"{name:34s} {1e3 * best:8.2f} ms", flush=True)
        return best

    # --- cumulative pipeline stages -------------------------------------
    def consume(tree):
        return sum(jnp.sum(x.astype(jnp.float32) * 1e-9)
                   for x in jax.tree.leaves(tree))

    def s_project(a, m):
        return consume(project_gaussians(m, cam_of(a * 11.25), cfg))

    def s_bin(a, m):
        sp = project_gaussians(m, cam_of(a * 11.25), cfg)
        return consume(binning.bin_splats(sp, cfg))

    def s_raster(a, m):
        sp = project_gaussians(m, cam_of(a * 11.25), cfg)
        b = binning.bin_splats(sp, cfg)
        return consume(rasterize.rasterize_tiles(b, cfg)[::4, ::97])

    def s_full(a, m):
        img = render(m, cam_of(a * 11.25), cfg, True).image
        return consume(img[::97, ::97])

    timed("project", s_project, model)
    timed("project+bin", s_bin, model)
    timed("project+bin+rasterize", s_raster, model)
    timed("full frame", s_full, model)

    # --- binning internals on fixed inputs ------------------------------
    # Build one projected frame's expansion inputs on the host side of the
    # stage: ncov (per-gaussian coverage counts) and the packed table.
    splats = jax.jit(lambda m: project_gaussians(m, cam_of(0.0), cfg))(model)
    p = cfg.pair_capacity

    def s_expand(a, ncov):
        # The scatter + two cummax fills of bin_splats (gid + rank).
        ncov = ncov + (a * 0).astype(jnp.int32)
        nn = ncov.shape[0]
        ncov_ext = jnp.concatenate([ncov, jnp.array([p], jnp.int32)])
        ends_cum = jnp.cumsum(ncov_ext)
        offsets_ext = ends_cum - ncov_ext
        first_slot = jnp.where(ncov_ext > 0, offsets_ext, p)
        iota_n = jnp.arange(nn + 1, dtype=jnp.int32)
        gid_at = jnp.zeros((p,), jnp.int32).at[first_slot].max(
            iota_n, mode="drop")
        gid = jax.lax.cummax(gid_at)
        slot = jnp.arange(p, dtype=jnp.int32)
        prev_gid = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), gid[:-1]])
        rank = slot - jax.lax.cummax(jnp.where(gid != prev_gid, slot, 0))
        return (jnp.sum(gid) + jnp.sum(rank)).astype(jnp.float32) * 1e-9

    x0, y0, nx, ny = binning.tile_ranges_of(splats, cfg)
    ncov = (nx * ny).astype(jnp.int32)
    body = jnp.concatenate([
        splats.xy, splats.conic, splats.color,
        splats.opacity[:, None], splats.depth[:, None]], axis=-1)
    live = ncov > 0

    def f24(v):
        return jnp.where(live, v, 0).astype(jnp.float32)[:, None]

    # 16-column fused-path layout (see binning._make_fused_table).
    packed = jnp.concatenate(
        [jnp.concatenate([body, f24(x0 | (y0 << 12)), f24(nx),
                          f24(jnp.zeros_like(x0)), f24(jnp.zeros_like(x0)),
                          f24(jnp.zeros_like(x0)), f24(jnp.zeros_like(x0))],
                         axis=-1),
         jnp.zeros((1, binning.NUM_FEATURES + 6), jnp.float32)])

    # Fixed (rank, gid_pre) from one expansion, reused across iterations.
    ncov_ext = jnp.concatenate([ncov, jnp.array([p], jnp.int32)])
    ends_cum = jnp.cumsum(ncov_ext)
    offsets_ext = ends_cum - ncov_ext
    first_slot = jnp.where(ncov_ext > 0, offsets_ext, p)
    iota_n = jnp.arange(n + 1, dtype=jnp.int32)
    gid_at = jnp.zeros((p,), jnp.int32).at[first_slot].max(iota_n,
                                                           mode="drop")
    gid = jax.lax.cummax(gid_at)
    slot = jnp.arange(p, dtype=jnp.int32)
    prev_gid = jnp.concatenate([jnp.full((1,), -1, jnp.int32), gid[:-1]])
    rank = slot - jax.lax.cummax(jnp.where(gid != prev_gid, slot, 0))
    gid_pre = jnp.where(gid >= n, n, gid)
    tile_bits = ((cfg.tiles_y + cfg.tiles_y) * cfg.tiles_x + 1).bit_length()

    def s_gather_only(a, packed, gid_pre):
        gid_pre = gid_pre + (a * 0).astype(jnp.int32)
        table = packed[gid_pre]
        # Consume the WHOLE result: a strided slice could let XLA narrow
        # the gather itself; unused outputs would be DCE'd entirely.
        return jnp.sum(table) * 1e-9

    def s_sort_only(a, key, gid_pre, cols):
        key = key + (a * 0).astype(jnp.int32)
        out = jax.lax.sort(tuple([key, gid_pre] + [cols[i] for i in
                                                   range(10)]), num_keys=1)
        # Consume EVERY operand: an unused carried column is DCE'd and the
        # sort silently degrades to a key-only sort (cheaper by far).
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out) * 1e-9

    def s_csr(a, tile_s):
        tile_s = tile_s + (a * 0).astype(jnp.int32)
        tids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
        st = jnp.searchsorted(tile_s, tids, side="left")
        en = jnp.searchsorted(tile_s, tids, side="right")
        return jnp.sum(st + en).astype(jnp.float32) * 1e-9

    timed("bin: expansion scans", s_expand, ncov)
    timed("bin: row gather only", s_gather_only, packed, gid_pre)

    from gaussian_splat_ipu_tpu.render.kernels import expand as expand_mod
    packed_t = expand_mod.pad_packed_cols(packed)

    def s_expand_kernel(a, packed_t, gid_pre):
        gp = gid_pre + (a * 0).astype(jnp.int32)
        ex = expand_mod.expand_pairs(packed_t, gp)
        return jnp.sum(ex[:, ::997]) * 1e-9

    timed("bin: expand kernel", s_expand_kernel, packed_t, gid_pre)
    key31 = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 31, p, dtype=np.int32))
    cols = [packed[gid_pre][:, i] for i in range(10)]
    timed("bin: sort only (12 ops)", s_sort_only, key31, gid_pre,
          jnp.stack(cols))
    feats, tile_s, gid_s = jax.jit(
        lambda pk, r, g: binning._make_fused_table(False, False)(
            pk, r, g, jnp.int32(31 - tile_bits),
            jnp.int32(cfg.tiles_x))
    )(packed, rank, gid_pre)
    timed("bin: CSR searchsorted", s_csr, tile_s)

    # Rasterize alone on fixed binned inputs.
    binned = jax.jit(lambda m: binning.bin_splats(
        project_gaussians(m, cam_of(0.0), cfg), cfg))(model)

    def s_raster_only(a, binned):
        b = binned._replace(
            features=binned.features + (a * 0).astype(jnp.float32))
        return consume(rasterize.rasterize_tiles(b, cfg)[::4, ::97])

    timed("rasterize only", s_raster_only, binned)

    def s_untile(a, tiles):
        t = tiles + a * 0
        return consume(_untile_crop(t, cfg)[::97, ::97])

    tiles0 = jax.jit(
        lambda b: rasterize.rasterize_tiles(b, cfg))(binned)
    timed("untile only", s_untile, tiles0)


if __name__ == "__main__":
    main()

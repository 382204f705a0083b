"""1M-gaussian frame benchmark across binning sort strategies.

The round-2 perf frontier (VERDICT r1 next-step #2): the 84.8 ms frame at
1M gaussians/720p is dominated by the P-wide radix sort over the pair
table. This measures the END-TO-END frame for each strategy (the
microbenchmark benchmarks/bench_sort.py isolates the sort itself):

  fused       one (tile | quantized-depth) i32 key, carried columns
  presort     depth-presort the N gaussians, tile-only pair key
  exact2pass  two stable single-key passes (exact full-depth order)

plus the effect of right-sizing pair_capacity to the probed demand
(every binning pass is O(capacity)).

Run on the real chip: python benchmarks/bench_1m.py [n_gaussians]
Optional: GSPLAT_VARIANTS=name1,name2 runs a subset — drive each variant
in its own subprocess under `timeout`: sustained heavy programs can wedge
the tunneled device, and a wedge inside one variant must not kill the
whole campaign (the compile cache makes re-runs cheap).
Two-point chained-scan timing (utils/profiling.py rationale).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

# `python benchmarks/bench_1m.py` puts benchmarks/ (not the repo root) on
# sys.path; append the root so the package imports without an install.
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT = 1280, 720


def two_point(frame_fn, cam_of_k, k1=1, k2=6, reps=3):
    import jax
    import jax.numpy as jnp

    def chain(k):
        @jax.jit
        def run(model):
            def body(c, i):
                img = frame_fn(model, cam_of_k(i))
                return c + img[::97, ::97].sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(k, dtype=jnp.float32))
            return c
        return run

    j1, j2 = chain(k1), chain(k2)
    return j1, j2, k1, k2, reps


def measure(model, j1, j2, k1, k2, reps):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(j1(model))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(j2(model))
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (k2 - k1))
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsplat_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.render.pipeline import render
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    cap_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    print("devices:", jax.devices(), flush=True)
    # GSPLAT_SCENE=clustered benchmarks the Gaussian-mixture synthetic
    # (VERDICT r4 #6): occlusion coherence + tile-occupancy skew that
    # the uniform scene lacks — early-exit benefit and sort-segment
    # skew enter the record. Default stays uniform for series
    # continuity with rounds 1-4.
    scene_kind = os.environ.get("GSPLAT_SCENE", "uniform")
    maker = (GaussianModel.clustered if scene_kind == "clustered"
             else GaussianModel.random)
    model = maker(jax.random.PRNGKey(0), n, extent=1.0)
    print(f"scene: {scene_kind}", flush=True)
    bb = np.array([1.0, 1.0, 1.0], np.float32)
    fov = float(np.radians(40.0))

    def cam_of_k(i):
        return Camera.orbit(-bb, bb, fov, WIDTH / HEIGHT,
                            rot_y_deg=i * 11.25)

    base = RasterConfig(image_width=WIDTH, image_height=HEIGHT,
                        pair_capacity=1 << cap_log2)

    # Demand probes (alpha-aware extents and the exact tile test both
    # reduce demand; capacity follows demand since every pass is O(P)).
    def probe(cfg):
        d = int(jax.jit(lambda m: render(m, cam_of_k(jnp.float32(0.0)),
                                         cfg, True).num_pairs)(model))
        # Chunk-aligned, NOT power-of-two: every binning pass is O(cap),
        # so pow2 rounding wastes up to 2x (a 3.4M demand would land on
        # 8.4M). 15% headroom + the orbit's own demand variation is
        # covered by probing the worst of 16 angles in real apps.
        cap = max(-(-int(d * 1.15) // 128) * 128, 4096)
        return d, cap

    base_tt = dataclasses.replace(base, exact_tile_test=True)
    base_g2 = dataclasses.replace(base, tile_group=2)
    base_g4 = dataclasses.replace(base, tile_group=4)
    base_g2_tt = dataclasses.replace(base_g2, exact_tile_test=True)
    base_g4_tt = dataclasses.replace(base_g4, exact_tile_test=True)

    # Probe LAZILY: each demand probe is a full 1M-scale render compile
    # through the tunnel (minutes) — only pay for the probe configs the
    # requested variants actually reference.
    probes = {}

    def probed(key, cfg):
        if key not in probes:
            d, cap = probe(cfg)
            probes[key] = (d, cap)
            print(f"pair demand[{key}] {d} -> tight {cap}", flush=True)
        return probes[key]

    def _rowseg_balanced(cfg0, cap_target=1 << 18, slack=1.08):
        from gaussian_splat_ipu_tpu.render import binning
        from gaussian_splat_ipu_tpu.render.projection import (
            project_gaussians)

        def rd_of(angle):
            sp = project_gaussians(model, cam_of_k(angle), cfg0)
            return binning.bucket_demands(sp, cfg0)

        jrd = jax.jit(rd_of)
        rd = np.max(np.stack([np.asarray(jrd(jnp.float32(a)))
                              for a in (0.0, 4.0, 8.0, 12.0)]), axis=0)
        total = int(rd.sum())
        # Bucket demand window: max bounded by the batched sort's pow2
        # pad (cap_target), min by the placement span (span ~ C*N/D,
        # see binning.balance_bounds).
        min_sum = int(2048 * n / 16384 * 1.25)
        r_seg = max(2, -(-int(total * slack) // cap_target))
        bounds = worst = None
        for r_try in range(r_seg, min(len(rd), 17)):
            b = binning.balance_bounds(rd, r_try, min_sum=min_sum)
            w = max(int(rd[b[i]:b[i + 1]].sum()) for i in range(r_try))
            lo = min(int(rd[b[i]:b[i + 1]].sum()) for i in range(r_try))
            if int(w * slack) <= cap_target:
                r_seg, bounds, worst = r_try, b, w
                print(f"rowseg balanced: R={r_seg} bounds={b} "
                      f"bucket range [{lo}, {w}]", flush=True)
                break
        if bounds is None:
            print("rowseg balanced: no feasible partition; flat cfg",
                  flush=True)
            return dataclasses.replace(
                cfg0, pair_capacity=probed("group2_tt", cfg0)[1])
        cap = max(-(-int(worst * slack) // 2048) * 2048, 2048)
        return dataclasses.replace(cfg0, rowseg_buckets=r_seg,
                                   rowseg_bounds=bounds,
                                   pair_capacity=r_seg * cap)

    variants = {
        "fused_full": lambda: base,
        "fused_tight": lambda: dataclasses.replace(
            base, pair_capacity=probed("base", base)[1]),
        "presort_tight": lambda: dataclasses.replace(
            base, pair_capacity=probed("base", base)[1],
            presort_depth=True),
        "exact2pass_tight": lambda: dataclasses.replace(
            base, pair_capacity=probed("base", base)[1],
            fused_sort_key=False),
        "fused_tight_tiletest": lambda: dataclasses.replace(
            base_tt, pair_capacity=probed("tiletest", base_tt)[1]),
        "presort_tight_tiletest": lambda: dataclasses.replace(
            base_tt, pair_capacity=probed("tiletest", base_tt)[1],
            presort_depth=True),
        # GS-TG-style super-tile binning: fewer pairs through every
        # O(P) pass + the sort; compositing reads group ranges.
        "fused_tight_group2": lambda: dataclasses.replace(
            base_g2, pair_capacity=probed("group2", base_g2)[1]),
        "presort_tight_group2": lambda: dataclasses.replace(
            base_g2, pair_capacity=probed("group2", base_g2)[1],
            presort_depth=True),
        "fused_tight_group4": lambda: dataclasses.replace(
            base_g4, pair_capacity=probed("group4", base_g4)[1]),
        "presort_tight_group4": lambda: dataclasses.replace(
            base_g4, pair_capacity=probed("group4", base_g4)[1],
            presort_depth=True),
        # Composed group + exact coverage mask (group-cell ellipse test):
        # both pair-cutting levers stacked (VERDICT r3 #8).
        "fused_tight_group2_tt": lambda: dataclasses.replace(
            base_g2_tt, pair_capacity=probed("group2_tt", base_g2_tt)[1]),
        # g=3: with the round-5 stream front-end the frame is
        # sort-bound, so the g sweet spot may have moved up (fewer
        # pairs through the radix vs more per-tile compositing reads).
        "fused_tight_group3_tt": lambda: dataclasses.replace(
            base, tile_group=3, exact_tile_test=True,
            pair_capacity=probed(
                "group3_tt", dataclasses.replace(
                    base, tile_group=3, exact_tile_test=True))[1]),
        "fused_tight_group4_tt": lambda: dataclasses.replace(
            base_g4_tt, pair_capacity=probed("group4_tt", base_g4_tt)[1]),
        # Relaxed-termination inference kernel on top of grouping
        # (colour-exact on black background; the interactive default).
        "fused_tight_group2_relaxed": lambda: dataclasses.replace(
            base_g2, pair_capacity=probed("group2", base_g2)[1],
            strict_termination=False),
        "fused_tight_group4_relaxed": lambda: dataclasses.replace(
            base_g4, pair_capacity=probed("group4", base_g4)[1],
            strict_termination=False),
        "fused_tight_relaxed": lambda: dataclasses.replace(
            base, pair_capacity=probed("base", base)[1],
            strict_termination=False),
        # Round-5 segmented sort: place pairs into row-bucket segments
        # (stream kernel) and run the 12-operand sort as a batched
        # (R, cap) 2D sort — XLA's flat 1D radix is superlinear past
        # 2^21 pairs. R must divide the group rows evenly or trailing
        # buckets idle while live ones overflow.
        # Demand-balanced boundaries (the design that survives row
        # skew): probe per-group-row demand, balance buckets to
        # ~total/R, size per-bucket capacity just under the 2^18 pow2
        # cliff of the batched sort.
        "fused_tight_group2_tt_rowsegbal": lambda: _rowseg_balanced(
            base_g2_tt),
        "fused_tight_group2_tt_rowseg6": lambda: dataclasses.replace(
            base_g2_tt, pair_capacity=probed("group2_tt", base_g2_tt)[1],
            rowseg_buckets=6),
        "fused_tight_group2_tt_rowseg12": lambda: dataclasses.replace(
            base_g2_tt, pair_capacity=probed("group2_tt", base_g2_tt)[1],
            rowseg_buckets=12),
        "fused_tight_group2_tt_rowseg4": lambda: dataclasses.replace(
            base_g2_tt, pair_capacity=probed("group2_tt", base_g2_tt)[1],
            rowseg_buckets=4),
        # Expansion A/B: expand_kernel (Pallas stream-expand; the
        # default on TPU) vs the XLA row gather
        # (tests/test_binning.py::test_expand_kernel_matches_gather).
        "fused_tight_xgather": lambda: dataclasses.replace(
            base, pair_capacity=probed("base", base)[1],
            expand_kernel=False),
        "fused_tight_group2_tt_xgather": lambda: dataclasses.replace(
            base_g2_tt, pair_capacity=probed("group2_tt", base_g2_tt)[1],
            expand_kernel=False),
        "fused_tight_group4_tt_xgather": lambda: dataclasses.replace(
            base_g4_tt, pair_capacity=probed("group4_tt", base_g4_tt)[1],
            expand_kernel=False),
    }
    only = os.environ.get("GSPLAT_VARIANTS", "")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        variants = {k: v for k, v in variants.items() if k in keep}
    variants = {k: make() for k, make in variants.items()}
    results = {}
    for name, cfg in variants.items():
        def frame(m, cam, cfg=cfg):
            return render(m, cam, cfg, True).image
        j1, j2, k1, k2, reps = two_point(frame, cam_of_k)
        float(j1(model)), float(j2(model))  # compile + warm
        dt = measure(model, j1, j2, k1, k2, reps)
        results[name] = round(1e3 * dt, 2)
        print(f"{name}: {1e3 * dt:.2f} ms/frame", flush=True)

    record = {"n_gaussians": n, "scene": scene_kind,
              "demand": {k: v[0] for k, v in probes.items()},
              "ms_per_frame": results}
    # Back-compat flat keys (pre-r3 schema) for any consumer of the old
    # records: demand / demand_tiletest / demand_group2 / demand_group4.
    flat = {"base": "demand", "tiletest": "demand_tiletest",
            "group2": "demand_group2", "group4": "demand_group4"}
    for k, name in flat.items():
        if k in probes:
            record[name] = probes[k][0]
    print(json.dumps(record))


if __name__ == "__main__":
    main()

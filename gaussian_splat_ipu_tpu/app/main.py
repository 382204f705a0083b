"""Application entry point: the interactive/offline render loop.

TPU-native rebuild of the reference application (src/main/splat.cpp):
flag parsing (:24-36), scene load + centring (:86-100), camera fit
(:186-195), engine compile, then the render loop with optional remote-UI
control (:245-322), per-frame throughput logging (:267-272,318) and a final
test.png dump (:326).

Run:  python -m gaussian_splat_ipu_tpu.app.main --input scene.ply
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

log = logging.getLogger("gsplat")


def parse_args(argv=None):
    """Flag parity with the reference CLI (splat.cpp:24-36) plus the knobs
    the reference hard-codes (image size, tile capacities)."""
    p = argparse.ArgumentParser(description="TPU gaussian splat renderer")
    p.add_argument("--input", "-o", required=True,
                   help="PLY or XYZ scene file")
    p.add_argument("--log-level", default="info",
                   choices=["trace", "debug", "info", "warn", "err", "off"])
    p.add_argument("--ui-port", type=int, default=0,
                   help="remote UI port (0 = headless)")
    p.add_argument("--device", default="tpu",
                   choices=["tpu", "cpu", "points"],
                   help="tpu = Pallas kernels; cpu = jnp fallback; points = "
                        "1-px point splats (reference --device cpu parity)")
    p.add_argument("--distributed", type=int, default=0, metavar="N",
                   help="shard gaussians + framebuffer tile rows across an "
                        "N-device mesh (render_sharded: per-destination "
                        "all_to_all splat exchange). 0 = single device. "
                        "Pixel-identical to single-device; adds exchange-"
                        "overflow drop telemetry to the UI histogram")
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--fov", type=float, default=40.0, help="degrees")
    p.add_argument("--frames", type=int, default=0,
                   help="headless: render N orbit frames then exit "
                        "(0 = single frame)")
    p.add_argument("--output", default="test.png",
                   help="final frame dump (splat.cpp:326 parity)")
    p.add_argument("--dump-frames", default="",
                   help="directory to write EVERY retired frame as "
                        "frame_%%05d.png (turntable/video export)")
    p.add_argument("--pair-capacity", type=int, default=1 << 19,
                   help="(gaussian, tile) pair-table size; every binning "
                        "pass is O(capacity). 0 = probe worst-case demand "
                        "over an orbit and right-size automatically")
    p.add_argument("--exact-tiles", action="store_true",
                   help="exact tile-ellipse coverage test: enumerate only "
                        "tiles a splat can actually light (fewer pairs, "
                        "identical image)")
    p.add_argument("--tile-group", type=int, default=1,
                   help="bin pairs over KxK super-tiles (GS-TG-style "
                        "sort reduction; 1 = off; composes with "
                        "--exact-tiles: the coverage mask then tests "
                        "KxK-tile cells)")
    p.add_argument("--rowseg", type=int, default=1,
                   help="segmented binning: place pairs into N tile-row "
                        "bucket segments and run the pair sort as a "
                        "batched 2D sort (round 5; 1 = off). Needs the "
                        "bucket count to divide the (group) rows evenly "
                        "and capacity covering the largest bucket")
    p.add_argument("--antialias", action="store_true",
                   help="energy-conserving lowpass (Mip-Splatting): "
                        "sub-pixel splats fade instead of brightening")
    p.add_argument("--strict-termination", action="store_true",
                   help="exact reference break semantics in the kernel "
                        "(codelets.cpp:405-408). Default off: the fast "
                        "inference kernel is colour-identical and only the "
                        "coverage (alpha) channel may exceed the strict "
                        "value by <= eps/(1-alpha_clamp)")
    p.add_argument("--compile-cache", default="",
                   help="persistent XLA compile cache dir "
                        "(saveExe/loadExe parity)")
    p.add_argument("--frames-in-flight", type=int, default=2,
                   help="render-ahead depth: JAX dispatch is async, so "
                        "keeping k frames in flight hides host->device "
                        "round-trip latency (1 = fully synchronous)")
    return p.parse_args(argv)


def _auto_pair_capacity(scene, width: int, height: int, fov: float,
                        use_pallas: bool, views: int = 8,
                        probe_cap: int = 1 << 21) -> int:
    """Probe worst-case (gaussian, tile) pair demand over an orbit and
    right-size the table. Every binning pass is O(pair_capacity), so this
    is the single biggest frame-time knob (BASELINE.md: halving 2^19 ->
    2^18 took the 720p frame from 17.3 to 10.3 ms); the reference fixes
    the analogous channel capacity in silicon (ipu_rasteriser.cpp:307).
    Doubles the probe table until nothing overflows, then takes the next
    power of two over 1.3x the worst view."""
    import jax
    import jax.numpy as jnp

    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.render.pipeline import render
    from gaussian_splat_ipu_tpu.utils.config import RasterConfig

    aspect = width / height
    while True:
        cfg = RasterConfig(image_width=width, image_height=height,
                           pair_capacity=probe_cap)

        @jax.jit
        def demand_of(m, rot):
            cam = Camera.orbit(scene.bb_min, scene.bb_max, fov, aspect,
                               rot_y_deg=rot)
            out = render(m, cam, cfg, use_pallas)  # noqa: B023
            return out.num_pairs + out.overflow

        worst = max(int(demand_of(scene.model,
                                  jnp.float32(360.0 * i / views)))
                    for i in range(views))
        if worst <= probe_cap or probe_cap >= 1 << 24:
            break
        probe_cap *= 4
    # Chunk-aligned, not power-of-two (every binning pass is O(capacity);
    # pow2 rounding can double the dominant frame cost for nothing).
    cap = max(int(worst * 1.3), 4 * cfg.chunk_size)
    return -(-cap // cfg.chunk_size) * cfg.chunk_size


def _probe_cache_path(compile_cache_dir: str) -> str:
    base = compile_cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "gsplat_ipu_tpu")
    return os.path.join(base, "pair_capacity_cache.json")


def _cached_pair_capacity(path_of_scene: str, scene, width: int,
                          height: int, fov: float, use_pallas: bool,
                          compile_cache_dir: str, log) -> int:
    """The demand probe with a persistent result cache (VERDICT r4 #8).

    --pair-capacity 0 re-probed a 16-render orbit (each a full jit
    compile through the tunnel) on EVERY app start; the probed capacity
    is a pure function of (scene, resolution, fov, kernel flavour), so
    it is cached as JSON next to the compile cache — the saveExe /
    loadExe discipline of the reference
    (include/ipu/ipu_utils.hpp:59-76) applied to the one piece of
    auto-tuning the compile cache cannot capture. The scene is keyed by
    file identity (path, size, mtime) + gaussian count: content hashing
    a multi-hundred-MB PLY would cost a probe's worth of IO.
    """
    import json

    try:
        st = os.stat(path_of_scene)
        ident = f"{os.path.abspath(path_of_scene)}:{st.st_size}:" \
                f"{int(st.st_mtime)}"
    except OSError:
        ident = path_of_scene
    key = (f"{ident}|{scene.model.num_gaussians}|{width}x{height}|"
           f"fov={fov:.5f}|pallas={use_pallas}")
    cache_file = _probe_cache_path(compile_cache_dir)
    cache = {}
    try:
        with open(cache_file) as f:
            cache = json.load(f)
        if key in cache:
            log.info("pair capacity from probe cache: %d", cache[key])
            return int(cache[key])
    except (OSError, ValueError):
        pass
    cap = _auto_pair_capacity(scene, width, height, fov, use_pallas)
    cache[key] = cap
    try:
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        with open(cache_file, "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass  # cache is an optimisation, never a failure
    return cap


def main(argv=None) -> int:
    args = parse_args(argv)

    from gaussian_splat_ipu_tpu.runtime import engine as engine_lib
    engine_lib.setup_logging(args.log_level)

    import jax

    from gaussian_splat_ipu_tpu.io.scene import load_scene
    from gaussian_splat_ipu_tpu.models.camera import Camera
    from gaussian_splat_ipu_tpu.render import points as points_render
    from gaussian_splat_ipu_tpu.render.pipeline import render
    from gaussian_splat_ipu_tpu.ui.async_task import AsyncTask
    from gaussian_splat_ipu_tpu.utils import image as image_util
    from gaussian_splat_ipu_tpu.utils.config import (RasterConfig,
                                                     RuntimeConfig)

    scene = load_scene(args.input)
    model = scene.model
    n = model.num_gaussians
    log.info("loaded %d gaussians from %s", n, args.input)

    if args.pair_capacity == 0 and args.device != "points":
        args.pair_capacity = _cached_pair_capacity(
            args.input, scene, args.width, args.height,
            float(np.radians(args.fov)), args.device == "tpu",
            args.compile_cache, log)
        log.info("auto pair capacity: %d", args.pair_capacity)
    elif args.pair_capacity == 0:
        args.pair_capacity = 1 << 12  # points path never builds pairs

    cfg = RasterConfig(image_width=args.width, image_height=args.height,
                       pair_capacity=args.pair_capacity,
                       exact_tile_test=args.exact_tiles,
                       antialias=args.antialias,
                       tile_group=args.tile_group,
                       rowseg_buckets=args.rowseg,
                       strict_termination=args.strict_termination)
    runtime_cfg = RuntimeConfig(
        compile_cache_dir=args.compile_cache,
        use_cpu_model=(args.device != "tpu"))
    engine = engine_lib.RenderEngine(runtime_cfg)

    aspect = args.width / args.height
    fov = float(np.radians(args.fov))

    # Camera synthesis happens INSIDE the jitted program (state scalars are
    # traced args): eager per-frame camera math costs more than the render.
    def make_camera(state) -> Camera:
        import jax.numpy as jnp
        return Camera.orbit(scene.bb_min, scene.bb_max, state["fov"],
                            aspect, rot_x_deg=state["rx"],
                            rot_y_deg=state["ry"],
                            translation=(state["x"], state["y"],
                                         state["z"]),
                            env_rot=jnp.stack([state["erx"],
                                               state["ery"]]))

    use_pallas = args.device == "tpu"

    # Distributed interactive rendering (reference flagship loop,
    # splat.cpp:245-322, at mesh scale): gaussians + framebuffer tile rows
    # sharded across the mesh, per-destination all_to_all splat exchange,
    # pixel-identical to the single-device pipeline (tests/
    # test_interactive_app.py asserts the PNG matches bit-for-bit).
    mesh = None
    if args.distributed > 1:
        if args.device == "points":
            raise SystemExit("--distributed requires the splat pipeline "
                             "(--device tpu or cpu)")
        from gaussian_splat_ipu_tpu.parallel import distributed as dist_lib
        from gaussian_splat_ipu_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(args.distributed)
        model = mesh_lib.shard_model(model, mesh)
        log.info("distributed: %d-device mesh, %d tile rows per device",
                 args.distributed,
                 dist_lib._rows_per_device(cfg, args.distributed))

    def splat_fn(m, state):
        cam = make_camera(state)
        if mesh is not None:
            # Correctness-first capacities for an INTERACTIVE viewer (the
            # camera is arbitrary, so worst-case concentration — every
            # splat on one device's strip — must not drop pairs): each
            # device gets the full --pair-capacity table, and exchange
            # buckets sized 2x the even share x mesh size (a splat
            # spanning k strips makes k pairs). Training keeps the lean
            # even-share defaults; here the cost is memory, not time
            # (binning passes are O(capacity) per device either way).
            nloc = -(-m.num_gaussians // args.distributed)
            out = dist_lib.render_sharded(
                m, cam, cfg, mesh, use_pallas=use_pallas,
                pair_capacity=cfg.pair_capacity,
                exchange_capacity=2 * nloc)
            # Crop phantom tile rows (tiles_y padded to the mesh size).
            return (out.image, out.tile_counts[:cfg.num_tiles],
                    out.overflow, out.truncated, out.exchange_overflow)
        out = render(m, cam, cfg, use_pallas)
        return (out.image, out.tile_counts, out.overflow, out.truncated,
                np.int32(0))

    def points_fn(m, state):
        cam = make_camera(state)
        out = points_render.render_points(m, cam, cfg)
        return (out.image, points_render.tile_histogram(m, cam, cfg),
                np.int32(0), np.int32(0), np.int32(0))

    state0 = {"fov": fov, "rx": 0.0, "ry": 0.0, "x": 0.0, "y": 0.0,
              "z": 0.0, "erx": 0.0, "ery": 0.0}
    example = (model, {k: np.float32(v) for k, v in state0.items()})
    # Two switchable programs, parity with the reference's runtime
    # cpu/ipu device toggle (src/main/splat.cpp:250-256): "project" is the
    # full splat pipeline, "points" the 1-px positional sanity renderer.
    engine.register("project",
                    points_fn if args.device == "points" else splat_fn,
                    example)
    if args.ui_port:
        engine.register("points", points_fn, example)
    log.info("engine ready: %s", engine.manifest())

    ui = None
    if args.ui_port:
        from gaussian_splat_ipu_tpu.ui.server import InterfaceServer
        ui = InterfaceServer(args.ui_port)
        ui.start()

    import collections

    ui_task = AsyncTask()
    image_host = None
    exposure, gamma = 1.0, 1.0
    program = "project"
    state = dict(state0)
    nframes = max(args.frames, 1)
    interactive = ui is not None and args.frames == 0
    inflight = collections.deque()
    t_last_retire = None
    # (overflow, truncated, exchange_overflow), telemetry cadence
    drop_counts = [(0, 0, 0)]
    last_image = None
    n_retired = 0
    if args.dump_frames:
        os.makedirs(args.dump_frames, exist_ok=True)

    i = 0
    stop = False
    try:
        while not stop:
            if ui is not None and ui.state_changed():
                s = ui.consume_state()
                stop = s.stop
                exposure, gamma = s.exposure, s.gamma
                # Runtime render-path toggle (reference "device" packet,
                # splat.cpp:250-256: cpu = point splats, ipu = full splat).
                program = ("points" if s.device in ("cpu", "points")
                           else "project")
                state.update(fov=s.fov, rx=s.rot_x_deg, ry=s.rot_y_deg,
                             x=s.x, y=s.y, z=s.z,
                             erx=s.env_rotation_x, ery=s.env_rotation_y)
                if s.detach:
                    # Reference detach semantics (InterfaceServer.hpp:26-27
                    # "Detach the remote-ui but continue: server can
                    # destroy the communication interface and continue"):
                    # tear down the client connection, keep rendering
                    # headless, and keep listening so a viewer can
                    # reconnect (which restarts the video stream on a
                    # keyframe).
                    ui_task.wait_for_completion()
                    ui.drop_client()
                    log.info("UI detached: rendering continues headless")
            elif not interactive:
                state["ry"] = 360.0 * i / nframes

            # Submit without blocking (JAX dispatch is async); retire the
            # oldest in-flight frame once the pipeline is full. On a
            # remote/tunneled device this hides the per-dispatch
            # round-trip; on a local chip it overlaps host work with
            # device compute (the reference overlaps its UI thread the
            # same way, splat.cpp:207-225).
            image_d, counts_d, ovf_d, trunc_d, xovf_d = engine.run(
                program, model,
                {k: np.float32(v) for k, v in state.items()})
            inflight.append((image_d, counts_d, ovf_d, trunc_d, xovf_d,
                             time.perf_counter()))

            def retire_one():
                nonlocal t_last_retire, last_image, n_retired
                (img_d, cnt_d, ovf_d, trc_d, xov_d,
                 t_submit) = inflight.popleft()
                img_d.block_until_ready()
                # Guarded-overflow telemetry (reference discipline,
                # codelets.cpp:487-490): zoom-in can exceed the pair table
                # or per-tile work bound; warn instead of silently dropping
                # splats. Rate-limited to the logging cadence; keyed to the
                # RETIRE count so the first frame of even a 1-frame run is
                # checked.
                if n_retired % 30 == 0:
                    # Each scalar fetch is a full device round trip
                    # (~40 ms over the tunnel): refresh on the telemetry
                    # cadence only and reuse for the UI histogram below.
                    drop_counts[0] = (int(ovf_d), int(trc_d), int(xov_d))
                    ovf, trc, xov = drop_counts[0]
                    if ovf or trc or xov:
                        log.warning(
                            "frame %d: dropped splat pairs (overflow=%d "
                            "over --pair-capacity, truncated=%d past the "
                            "per-tile work bound, exchange_overflow=%d at "
                            "the all_to_all bucket capacity)",
                            i, ovf, trc, xov)
                if args.dump_frames:
                    image_util.write_png(
                        os.path.join(args.dump_frames,
                                     f"frame_{n_retired:05d}.png"),
                        np.asarray(img_d))
                n_retired += 1
                now = time.perf_counter()
                if t_last_retire is not None and i % 30 == 0:
                    dt = max(now - t_last_retire, 1e-9)
                    log.info("frame %d: %.2f ms (%.1f fps, %.2f "
                             "Msplats/s; latency %.1f ms)", i, dt * 1e3,
                             1.0 / dt, n / dt / 1e6,
                             (now - t_submit) * 1e3)
                t_last_retire = now
                last_image = img_d

                if ui is not None:
                    # Overlap encode/send with the next frame
                    # (splat.cpp:280-283 double-buffering via AsyncTask).
                    ui_task.wait_for_completion()
                    img_host = np.asarray(img_d)
                    cnt_host = np.asarray(cnt_d)

                    def push(img=img_host, cnt=cnt_host, ex=exposure,
                             gm=gamma, ov=drop_counts[0][0],
                             tr=drop_counts[0][1], xo=drop_counts[0][2]):
                        # Continuous video stream (long-lived encoder,
                        # ui/stream.py) — not independent stills.
                        ui.send_video_frame(img, ex, gm)
                        ui.send_histogram(cnt, overflow=ov, truncated=tr,
                                          exchange_overflow=xo)

                    ui_task.run(push)

            if len(inflight) >= max(args.frames_in_flight, 1):
                retire_one()

            i += 1
            if not interactive and i >= nframes:
                break

        # Drain through the same retire path so every frame — including
        # the whole pipeline of a short run — reaches the UI.
        while inflight:
            retire_one()
    finally:
        if ui is not None:
            ui_task.wait_for_completion()
            ui.stop()

    image_util.write_png(args.output, np.asarray(last_image))
    log.info("wrote %s", args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

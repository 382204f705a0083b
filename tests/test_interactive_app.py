"""Interactive session integration test: app loop + UI server + client.

Drives the whole L5/L6 stack the way the reference's remote viewer does
(SURVEY.md §3.4): connect over TCP, receive ready + preview frames +
histograms, push fov/device/stop control packets, and check the app
honours them (including the runtime render-path toggle,
splat.cpp:250-256 parity).
"""

import socket
import threading
import time

import numpy as np

from gaussian_splat_ipu_tpu.ui.server import InterfaceClient
from gaussian_splat_ipu_tpu.utils import image as image_util

import pytest

# Heavy mesh/CLI integration tests: the fast tier is `pytest -m 'not slow'`
# (VERDICT r3 #7).
pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_interactive_session(tmp_path):
    from gaussian_splat_ipu_tpu.app import main as app_main

    scene = tmp_path / "pts.xyz"
    rng = np.random.default_rng(0)
    np.savetxt(scene, rng.uniform(-1, 1, (64, 3)), fmt="%.5f")
    out = tmp_path / "final.png"
    port = _free_port()

    rc_holder = {}

    def run_app():
        rc_holder["rc"] = app_main.main([
            "--input", str(scene), "--device", "cpu", "--width", "64",
            "--height", "64", "--ui-port", str(port), "--output",
            str(out), "--pair-capacity", str(1 << 12),
            "--log-level", "off",
        ])

    t = threading.Thread(target=run_app, daemon=True)
    t.start()

    # Connect (retry while the app compiles its programs).
    client = None
    deadline = time.time() + 90
    while client is None and time.time() < deadline:
        try:
            client = InterfaceClient("127.0.0.1", port, timeout=10.0)
        except OSError:
            time.sleep(0.2)
    assert client is not None, "could not connect to UI server"

    ptype, _ = client.recv()
    assert ptype == "ready"

    # Control packets: rotate the view and switch to the point renderer.
    client.send("lambda2", 90.0)
    client.send("device", "cpu")

    # Collect until we have a DECODED preview frame and a histogram: the
    # preview channel is now a continuous video stream (ui/stream.py) and
    # a fresh client must be able to join it (keyframe first).
    frame = None
    histogram = None
    deadline = time.time() + 60
    while (frame is None or histogram is None) and time.time() < deadline:
        ptype, payload = client.recv()
        if ptype == "render_preview":
            decoded = client.decode_preview(payload)
            if decoded is not None:
                frame = decoded
        elif ptype == "tile_histogram":
            histogram = payload
    assert frame is not None, "no decodable preview frame"
    assert frame.shape[:2] == (64, 64)
    assert histogram is not None
    import json
    hist = json.loads(histogram.decode())
    assert "overflow" in hist and "truncated" in hist

    # Detach: the app must drop this connection but keep rendering and
    # keep listening (reference detach comment, InterfaceServer.hpp:26-27).
    client.send("detach")
    deadline = time.time() + 30
    dropped = False
    while time.time() < deadline and not dropped:
        try:
            client.recv()
        except socket.timeout:
            continue
        except (ConnectionError, OSError):
            dropped = True
    assert dropped, "server did not drop the detached client"
    client.close()

    # Reconnect: the accept loop is still alive, the stream restarts on
    # a keyframe, and control still works.
    client = None
    deadline = time.time() + 30
    while client is None and time.time() < deadline:
        try:
            client = InterfaceClient("127.0.0.1", port, timeout=10.0)
        except OSError:
            time.sleep(0.2)
    assert client is not None, "could not reconnect after detach"
    frame2 = None
    deadline = time.time() + 60
    while frame2 is None and time.time() < deadline:
        ptype, payload = client.recv()
        if ptype == "render_preview":
            frame2 = client.decode_preview(payload)
    assert frame2 is not None, "no keyframe after reconnect"

    client.send("stop")
    t.join(timeout=60)
    assert not t.is_alive()
    assert rc_holder.get("rc") == 0
    with open(out, "rb") as f:
        final = image_util.decode_png(f.read())
    assert final.shape == (64, 64, 4)
    client.close()


def test_auto_pair_capacity_probe(tmp_path, monkeypatch):
    # --pair-capacity 0: probe worst-case orbit demand, right-size to the
    # next power of two over 1.3x, and run the app at that capacity.
    import functools

    import jax

    from gaussian_splat_ipu_tpu.app import main as app_main
    from gaussian_splat_ipu_tpu.io.scene import load_scene
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.train import checkpoint

    model = GaussianModel.random(jax.random.PRNGKey(0), 128, extent=0.8)
    ply = str(tmp_path / "scene.ply")
    checkpoint.export_ply(ply, model)

    scene = load_scene(ply)
    cap = app_main._auto_pair_capacity(scene, 64, 48, np.radians(40.0),
                                       use_pallas=False, views=4,
                                       probe_cap=1 << 13)
    assert cap & (cap - 1) == 0          # power of two
    assert 4 * 128 <= cap <= 1 << 13     # sane range for 128 splats

    # CLI wiring: --pair-capacity 0 goes through the probe (shrunk for CPU)
    monkeypatch.setattr(
        app_main, "_auto_pair_capacity",
        functools.partial(app_main._auto_pair_capacity, views=2,
                          probe_cap=1 << 13))
    out = tmp_path / "auto.png"
    rc = app_main.main([
        "--input", ply, "--width", "64", "--height", "48",
        "--pair-capacity", "0", "--device", "cpu", "--frames", "1",
        "--output", str(out), "--log-level", "off"])
    assert rc == 0
    assert out.exists()


def test_distributed_app_matches_single_device(tmp_path):
    # VERDICT r3 #5: the interactive app at mesh scale. The same CLI run
    # with --distributed 8 (gaussians + framebuffer tile rows sharded over
    # the 8-device mesh, all_to_all splat exchange) must produce the
    # single-device PNG bit-for-bit (reference flagship loop,
    # splat.cpp:245-322).
    import jax

    from gaussian_splat_ipu_tpu.app import main as app_main
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.train import checkpoint

    model = GaussianModel.random(jax.random.PRNGKey(2), 96, extent=0.8)
    ply = str(tmp_path / "scene.ply")
    checkpoint.export_ply(ply, model)

    common = ["--input", ply, "--width", "64", "--height", "64",
              "--device", "cpu", "--frames", "4",
              "--pair-capacity", str(1 << 12), "--log-level", "off"]
    out1 = tmp_path / "single.png"
    assert app_main.main(common + ["--output", str(out1)]) == 0
    out8 = tmp_path / "dist.png"
    assert app_main.main(common + ["--output", str(out8),
                                   "--distributed", "8"]) == 0
    img1 = image_util.decode_png(out1.read_bytes())
    img8 = image_util.decode_png(out8.read_bytes())
    np.testing.assert_array_equal(img1, img8)


def test_distributed_app_streams_ui(tmp_path):
    # The distributed render loop drives the remote UI like the
    # single-device one: video frames decode and the histogram packet
    # carries the sharded drop counters (incl. exchange_overflow).
    import json

    import jax

    from gaussian_splat_ipu_tpu.app import main as app_main
    from gaussian_splat_ipu_tpu.models.gaussians import GaussianModel
    from gaussian_splat_ipu_tpu.train import checkpoint

    model = GaussianModel.random(jax.random.PRNGKey(3), 64, extent=0.8)
    ply = str(tmp_path / "scene.ply")
    checkpoint.export_ply(ply, model)
    port = _free_port()
    out = tmp_path / "final.png"

    rc_holder = {}

    def run_app():
        rc_holder["rc"] = app_main.main([
            "--input", ply, "--device", "cpu", "--width", "64",
            "--height", "64", "--ui-port", str(port), "--output",
            str(out), "--pair-capacity", str(1 << 12),
            "--distributed", "8", "--log-level", "off",
        ])

    t = threading.Thread(target=run_app, daemon=True)
    t.start()

    client = None
    deadline = time.time() + 300
    while client is None and time.time() < deadline:
        try:
            client = InterfaceClient("127.0.0.1", port, timeout=10.0)
        except OSError:
            time.sleep(0.2)
    assert client is not None, "could not connect to UI server"

    # The first frame arrives only after the distributed program's
    # CPU-mesh compile (minutes under load): tolerate recv timeouts
    # until the deadline.
    frame = None
    hist = None
    ready = False
    deadline = time.time() + 420
    while (frame is None or hist is None) and time.time() < deadline:
        try:
            ptype, payload = client.recv()
        except socket.timeout:
            continue
        if ptype == "ready":
            ready = True
        elif ptype == "render_preview":
            decoded = client.decode_preview(payload)
            if decoded is not None:
                frame = decoded
        elif ptype == "tile_histogram":
            hist = json.loads(payload.decode())
    assert ready
    assert frame is not None and frame.shape[:2] == (64, 64)
    assert hist is not None and "exchange_overflow" in hist
    assert len(hist["counts"]) == 4  # num_tiles, phantom rows cropped

    client.send("stop")
    t.join(timeout=120)
    assert rc_holder.get("rc") == 0
    client.close()


def test_viewer_cli_records_stream(tmp_path):
    # The consumer-side viewer CLI (ui/viewer.py): attach to a running
    # app, record decoded frames + histogram, detach leaving it alive.
    import json

    from gaussian_splat_ipu_tpu.app import main as app_main
    from gaussian_splat_ipu_tpu.ui import viewer

    scene = tmp_path / "pts.xyz"
    rng = np.random.default_rng(1)
    np.savetxt(scene, rng.uniform(-1, 1, (64, 3)), fmt="%.5f")
    port = _free_port()
    out_dir = tmp_path / "rec"

    rc_holder = {}

    def run_app():
        rc_holder["rc"] = app_main.main([
            "--input", str(scene), "--device", "cpu", "--width", "64",
            "--height", "64", "--ui-port", str(port), "--output",
            str(tmp_path / "final.png"),
            "--pair-capacity", str(1 << 12), "--log-level", "off",
        ])

    t = threading.Thread(target=run_app, daemon=True)
    t.start()

    deadline = time.time() + 90
    rc = None
    while rc is None and time.time() < deadline:
        try:
            rc = viewer.main(["--port", str(port), "--seconds", "6",
                              "--spin", "30", "--out", str(out_dir),
                              "--fov", "45"])
        except OSError:
            time.sleep(0.2)
    assert rc == 0
    frames = sorted(out_dir.glob("view_*.png"))
    assert frames, "viewer recorded no frames"
    assert (out_dir / "histogram.json").exists()
    hist = json.loads((out_dir / "histogram.json").read_text())
    assert "counts" in hist

    # Detach left the app alive: a second viewer session can stop it.
    rc2 = viewer.main(["--port", str(port), "--seconds", "1", "--stop"])
    assert rc2 == 0
    t.join(timeout=60)
    assert rc_holder.get("rc") == 0

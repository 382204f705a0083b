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

    # Collect until we have a preview frame and a histogram.
    got = {}
    deadline = time.time() + 60
    while (("render_preview" not in got or "tile_histogram" not in got)
           and time.time() < deadline):
        ptype, payload = client.recv()
        got[ptype] = payload
    assert "render_preview" in got
    assert "tile_histogram" in got
    preview = got["render_preview"]
    if preview[:8] == b"\x89PNG\r\n\x1a\n":
        frame = image_util.decode_png(preview)
        assert frame.shape == (64, 64, 4)
    else:                              # JPEG preview (PIL available)
        import io

        from PIL import Image
        frame = np.asarray(Image.open(io.BytesIO(preview)))
        assert frame.shape[:2] == (64, 64)

    client.send("stop")
    t.join(timeout=60)
    assert not t.is_alive()
    assert rc_holder.get("rc") == 0
    with open(out, "rb") as f:
        final = image_util.decode_png(f.read())
    assert final.shape == (64, 64, 4)
    client.close()

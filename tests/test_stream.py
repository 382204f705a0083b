"""Continuous preview video stream (ui/stream.py): the long-lived
encoder/decoder pair standing in for the reference's persistent FFmpeg
video channel (include/remote_ui/InterfaceServer.hpp:100-108,322-328)."""

import numpy as np

from gaussian_splat_ipu_tpu.ui import stream


def _frames(n=8, h=48, w=64, seed=0):
    # Smooth render-like content (gradient + a bright moving blob), not
    # noise — representative of actual framebuffer frames.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = []
    for i in range(n):
        img = np.stack([xx / w, yy / h, 0.3 + 0 * xx], -1)
        cx, cy = 10 + 3 * i, 20
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 40.0))
        img = np.clip(img + blob[..., None], 0, 1)
        out.append((img * 255).astype(np.uint8))
    return out


def test_stream_starts_with_keyframe_then_predicts():
    enc = stream.VideoEncoder(keyframe_interval=1000, deadzone=2)
    dec = stream.VideoDecoder()
    frames = _frames()
    pkts = [enc.encode(f) for f in frames]
    assert pkts[0][4] == stream.FRAME_I
    assert any(p[4] == stream.FRAME_P for p in pkts[1:]), \
        "smooth motion should be temporally predicted"
    # P-frame contract: every decoded P-frame is within the dead-zone of
    # the true frame (DPCM against the encoder's own reconstruction —
    # error bounded, never accumulating).
    outs = [dec.decode(p) for p in pkts]
    for k in range(1, len(frames)):
        if pkts[k][4] == stream.FRAME_P:
            err = np.abs(outs[k].astype(np.int16)
                         - frames[k].astype(np.int16)).max()
            assert err <= 2, f"frame {k}: max err {err}"


def test_stream_zero_deadzone_is_lossless_between_keyframes():
    enc = stream.VideoEncoder(keyframe_interval=1000, deadzone=0)
    dec = stream.VideoDecoder()
    frames = _frames(4)
    outs = []
    pkts = []
    for f in frames:
        p = enc.encode(f)
        pkts.append(p)
        outs.append(dec.decode(p))
    for k in range(1, 4):
        if pkts[k][4] == stream.FRAME_P:
            np.testing.assert_array_equal(outs[k], frames[k])


def test_stream_pframes_beat_stills_on_static_content():
    enc = stream.VideoEncoder(keyframe_interval=1000)
    frame = _frames(1)[0]
    first = enc.encode(frame)
    second = enc.encode(frame)   # forced P: cleans up the keyframe error
    third = enc.encode(frame)    # now truly static
    assert second[4] == stream.FRAME_P
    assert third[4] == stream.FRAME_P
    # A static frame costs almost nothing vs an independent still.
    assert len(third) < len(first) / 10


def test_stream_forced_keyframe_interval():
    enc = stream.VideoEncoder(keyframe_interval=4)
    frames = _frames(9)
    types = [enc.encode(f)[4] for f in frames]
    assert types[0] == stream.FRAME_I
    assert types[4] == stream.FRAME_I  # seq 4 % 4 == 0
    assert types[8] == stream.FRAME_I


def test_stream_new_client_gets_keyframe():
    enc = stream.VideoEncoder(keyframe_interval=1000)
    frames = _frames(3)
    enc.encode(frames[0])
    enc.encode(frames[1])
    enc.force_keyframe()                # client reconnected
    pkt = enc.encode(frames[2])
    assert pkt[4] == stream.FRAME_I
    # A fresh decoder can join at this packet.
    dec = stream.VideoDecoder()
    out = dec.decode(pkt)
    assert out is not None and out.shape == frames[2].shape


def test_stream_late_join_waits_for_keyframe():
    enc = stream.VideoEncoder(keyframe_interval=1000)
    dec = stream.VideoDecoder()
    frames = _frames(4)
    pkts = [enc.encode(f) for f in frames]
    # Join at a P-frame (pkt 1 is the forced post-keyframe P): decoder
    # must return None, not garbage.
    assert pkts[1][4] == stream.FRAME_P
    assert dec.decode(pkts[1]) is None


def test_stream_f32_rgba_input():
    enc = stream.VideoEncoder()
    dec = stream.VideoDecoder()
    img = np.random.default_rng(1).uniform(0, 1, (32, 32, 4)).astype(
        np.float32)
    out = dec.decode(enc.encode(img))
    assert out.shape == (32, 32, 3)     # alpha dropped, u8 tonemap


def test_hdr_chunked_roundtrip():
    # The raw-HDR transfer (InterfaceServer.hpp:335-386 role): server
    # chunks, client reassembles, float-exact.
    import json
    import queue

    from gaussian_splat_ipu_tpu.ui.server import (InterfaceClient,
                                                  InterfaceServer)

    sent = queue.Queue()

    class _Srv(InterfaceServer):
        def __init__(self):
            super().__init__(port=0)
            self._client = object()     # pretend-connected

        def _send(self, ptype, payload):
            sent.put((ptype, payload))

    srv = _Srv()
    img = np.random.default_rng(2).normal(
        size=(17, 23, 4)).astype(np.float32)
    srv.send_hdr_image(img, chunk_bytes=500)

    client = InterfaceClient.__new__(InterfaceClient)
    client._hdr = None
    out = None
    while not sent.empty():
        ptype, payload = sent.get()
        got = client.feed_hdr(ptype, payload)
        if got is not None:
            out = got
    np.testing.assert_array_equal(out, img)

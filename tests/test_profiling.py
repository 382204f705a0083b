"""Profiling/observability tests (SURVEY.md §5 PVTI-parity subsystem)."""

import logging

import jax.numpy as jnp
import numpy as np

from gaussian_splat_ipu_tpu.utils import profiling


class TestTracepoints:
    def test_accumulates(self):
        profiling.reset_tracepoints()
        with profiling.Tracepoint("render"):
            _ = jnp.arange(4).sum()
        with profiling.Tracepoint("render"):
            pass
        s = profiling.tracepoint_summary()
        assert s["render"]["count"] == 2
        assert s["render"]["total_s"] >= 0.0
        profiling.reset_tracepoints()
        assert profiling.tracepoint_summary() == {}


class TestFrameMeter:
    def test_logs_after_interval(self, caplog):
        meter = profiling.FrameMeter(1000, log_every_s=0.0)
        with caplog.at_level(logging.INFO, logger="gsplat"):
            meter.tick()
        assert any("fps" in r.message for r in caplog.records)


class TestTwoPoint:
    def test_linear_work_scales(self):
        import time
        calls = []

        def run_k(k):
            calls.append(k)
            time.sleep(0.005 + 0.002 * k)  # fixed latency + per-iter cost

        per = profiling.two_point_time(run_k, k1=1, k2=9)
        assert calls == [1, 9, 1, 9]
        assert 0.001 < per < 0.004  # recovers ~2ms/iter, latency cancelled


def test_public_api_lazy_imports():
    import gaussian_splat_ipu_tpu as pkg
    assert pkg.RasterConfig().tile_width == 32
    model = pkg.GaussianModel.random(__import__("jax").random.PRNGKey(0), 8)
    assert model.num_gaussians == 8
    assert np.isfinite(np.asarray(model.means)).all()

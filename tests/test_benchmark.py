"""Benchmark harness tests: traces, metric extraction, end-to-end replay."""

import asyncio

import numpy as np
import pytest

from sduss_tpu.benchmark.metrics import (RequestRecord, compute_metrics,
                                         records_from_csv, records_to_csv,
                                         slo_deadline_s)
from sduss_tpu.benchmark.traces import generate_trace, load_trace, save_trace


class TestTraces:
    def test_poisson_rate(self):
        rows = generate_trace(qps=2.0, num_requests=2000,
                              resolutions=(512, 768, 1024), seed=0)
        arrivals = np.asarray([r.arrival_ms for r in rows])
        measured_qps = len(rows) / (arrivals[-1] / 1000.0)
        assert abs(measured_qps - 2.0) / 2.0 < 0.1

    def test_distribution_mix(self):
        rows = generate_trace(qps=1.0, num_requests=3000,
                              resolutions=(512, 768, 1024),
                              distribution="large", seed=1)
        counts = {r: 0 for r in (512, 768, 1024)}
        for row in rows:
            counts[row.resolution] += 1
        assert counts[1024] > counts[768] > counts[512]

    def test_roundtrip_csv(self, tmp_path):
        rows = generate_trace(1.0, 10, (512,), seed=2)
        p = str(tmp_path / "trace.csv")
        save_trace(rows, p)
        back = load_trace(p)
        assert len(back) == 10
        assert back[3].resolution == rows[3].resolution
        np.testing.assert_allclose(back[3].arrival_ms, rows[3].arrival_ms,
                                   atol=1e-3)


class TestMetrics:
    def test_slo_deadlines_match_reference_table(self):
        # reference scripts/draw/get_metric.py:44-50
        assert slo_deadline_s("sdxl", 1024, slo=5) == 19.31
        assert slo_deadline_s("sdxl", 512, slo=3) == pytest.approx(16.35 * 0.6)
        assert slo_deadline_s("sd3", 1024, slo=10) == pytest.approx(60.0)

    def test_compute_metrics(self):
        recs = [
            RequestRecord("a", 1024, 0.0, 10.0),            # meets SLO
            RequestRecord("b", 1024, 1.0, 30.0),            # misses
            RequestRecord("c", 512, 2.0, 5.0, aborted=True),  # aborted
        ]
        m = compute_metrics(recs, "sdxl", slo=5)
        assert m["num_requests"] == 3
        assert m["slo_attainment"] == pytest.approx(1 / 3)
        assert m["abort_rate"] == pytest.approx(1 / 3)
        assert m["throughput_rps"] == pytest.approx(2 / 30.0)
        assert m["goodput_rps"] == pytest.approx(1 / 30.0)

    def test_csv_roundtrip(self, tmp_path):
        recs = [RequestRecord("a", 512, 1.0, 3.5, aborted=False),
                RequestRecord("b", 768, 2.0, 9.0, aborted=True)]
        p = str(tmp_path / "client.csv")
        records_to_csv(recs, p)
        back = records_from_csv(p)
        assert back[1].aborted is True
        assert back[0].latency_s == pytest.approx(2.5)


@pytest.mark.slow
class TestReplayEndToEnd:
    def test_replay_tiny_engine(self):
        """Full trace replay through the async engine on the CPU mesh."""
        from sduss_tpu.benchmark.replay import run_replay
        from sduss_tpu.benchmark.traces import generate_trace
        from sduss_tpu.config import Config, ModelConfig

        config = Config()
        config.model = ModelConfig(model="sd15", test_tiny=True, dtype="float32")
        config.scheduler.policy = "fcfs_mixed"
        rows = generate_trace(qps=20.0, num_requests=4, resolutions=(256, 512),
                              steps=2, seed=0)
        records = run_replay(config, rows, slo=5, time_scale=0.05)
        assert len(records) == 4
        m = compute_metrics(records, "sd15", slo=5)
        assert m["num_requests"] == 4
        assert m["abort_rate"] == 0.0


def test_slo_deadline_out_of_table_scales_by_pixels():
    """Resolutions outside the published H100 table (e.g. tiny 256) scale
    the nearest entry by pixel count instead of raising."""
    from sduss_tpu.benchmark.metrics import slo_deadline_s

    d256 = slo_deadline_s("sd3", 256, slo=5)
    d512 = slo_deadline_s("sd3", 512, slo=5)
    assert abs(d256 - d512 * 0.25) < 1e-9

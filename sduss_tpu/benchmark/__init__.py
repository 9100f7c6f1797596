"""Benchmark harness: trace generation, replay, SLO metric extraction.

Rebuilds the reference's experiment tooling (exp/qps_*.csv traces,
tests/server/direct_test.py replay driver, scripts/draw/get_metric.py
metric extraction) as a first-class package.
"""

from sduss_tpu.benchmark.traces import TraceRow, generate_trace, load_trace, save_trace  # noqa: F401
from sduss_tpu.benchmark.metrics import compute_metrics, slo_deadline_s  # noqa: F401

"""The driver records only the last ~2000 bytes of bench.py stdout and
parses the FINAL line (BENCH_r05.json: "parsed": null — the r05 contract
line grew past the window and was truncated mid-JSON). Pin the contract
line's worst-case size below the window WITHOUT running Spark: rebuild the
exact dict bench.main() emits, with every timing at its widest plausible
rendering (a FAIL_PENALTY-scale float), and measure the serialized line.
"""

from __future__ import annotations

import json

import bench


def _contract_size(n_failed: int = 0) -> int:
    worst = 99999.999  # > FAIL_PENALTY, wider than any realistic timing
    timings = {n: worst for n in bench.HEADLINE}
    extended = {n: worst for n in bench.EXTENDED + list(bench.CUSTOM)}
    sentinel = {"python_loop_sec": worst, "numpy_matmul_sec": worst}
    out = {
        "metric": "headline_queries_total_wall",
        "value": worst * len(timings),
        "unit": "sec",
        "queries": timings,
        "queries_extended": extended,
        "extended_total": worst * len(extended),
        "sf": 0.001,
        "stat": f"median_of_{bench.NUM_RUNS}_interleaved",
        "sentinel_before": sentinel,
        "sentinel_after": sentinel,
        "sentinel_health": "degraded",
    }
    if n_failed:
        out["failed"] = sorted(bench.HEADLINE)[:n_failed]
    return len(json.dumps(out))


def test_contract_line_fits_driver_tail_window():
    # 1900 is bench.py's own guard threshold; the driver window is 2000.
    assert _contract_size() < 1900, _contract_size()


def test_contract_line_fits_even_with_failures():
    # a broken round lists failed keys — the line must still parse
    assert _contract_size(n_failed=5) < 2000, _contract_size(5)


def test_sentinel_health_verdict():
    ref = bench.SENTINEL_REF
    idle = dict(ref)
    assert bench.sentinel_health(idle, idle) == ("healthy", 1.0)
    # one degraded sentinel in EITHER probe flips the verdict
    hot = {k: v * 1.5 for k, v in ref.items()}
    assert bench.sentinel_health(idle, hot)[0] == "degraded"
    assert bench.sentinel_health(hot, idle)[0] == "degraded"
    edge = {k: v * bench.SENTINEL_HEALTHY_MAX for k, v in ref.items()}
    assert bench.sentinel_health(idle, edge)[0] == "healthy"

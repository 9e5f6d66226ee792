"""The driver records only the last ~2000 bytes of bench.py stdout and
parses the FINAL line (BENCH_r05.json: "parsed": null — the r05 contract
line grew past the window and was truncated mid-JSON). Drive bench.py's
actual emission logic (``contract_line``) with worst-case renderings,
WITHOUT running Spark: the line must always fit and parse. Since r11
per-row extended medians never ride the line (39 rows outgrew the
budget) — they live in BENCH_DETAIL.json + an earlier stdout line — and
the line carries the frozen v2 gate fields plus the extended AGGREGATE
(extended_total / extended_n).
"""

from __future__ import annotations

import json

import bench


def _out(per_query: float, n_failed: int = 0) -> dict:
    timings = {n: per_query for n in bench.HEADLINE}
    extended = {n: per_query for n in bench.EXTENDED + list(bench.CUSTOM)}
    sentinel = {"python_loop_sec": per_query, "numpy_matmul_sec": per_query}
    out = {
        "metric": "headline_queries_total_wall",
        "value": per_query * len(timings),
        "unit": "sec",
        "queries": timings,
        "queries_extended": extended,
        "extended_total": per_query * len(extended),
        "sf": 0.001,
        "stat": f"median_of_{bench.NUM_RUNS}_interleaved",
        "sentinel_before": sentinel,
        "sentinel_after": sentinel,
        "sentinel_health": "degraded",
    }
    if n_failed:
        out["failed"] = sorted(bench.HEADLINE)[:n_failed]
    return out


def test_contract_line_always_fits_and_parses():
    # worst plausible rendering: FAIL_PENALTY-scale floats everywhere,
    # up to a FULL-SUITE failed list (the r08 review gap: 46 failed keys
    # overran the window even with extended rows dropped)
    suite = len(bench.HEADLINE) + len(bench.EXTENDED) + len(bench.CUSTOM)
    for n_failed in (0, 5, len(bench.HEADLINE), suite):
        out = _out(99999.999)
        if n_failed:
            out["failed"] = sorted(bench.HEADLINE + bench.EXTENDED
                                   + list(bench.CUSTOM))[:n_failed]
        line = bench.contract_line(out)
        assert len(line) < 2000, (n_failed, len(line))
        parsed = json.loads(line)
        # the frozen v2 gate fields are never sacrificed
        assert set(parsed["queries"]) == set(bench.HEADLINE)
        assert parsed["sentinel_health"] == "degraded"
        # the extended aggregate always survives; per-row never rides
        assert parsed["extended_n"] == len(bench.EXTENDED) + len(bench.CUSTOM)
        assert "extended_total" in parsed
        assert "queries_extended" not in parsed
        if n_failed:
            # breakage stays visible: a count survives any truncation
            assert parsed.get("failed_count", len(parsed["failed"])) == n_failed


def test_realistic_contract_has_budget_headroom():
    # normal rounds (single-digit seconds, 3-decimal medians) must leave
    # real headroom — the r09/r11 lesson: each growth spurt of the suite
    # ate the budget silently until a guard said so
    line = bench.contract_line(_out(123.456))
    assert len(line) < 1400, len(line)


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


def test_every_bench_suite_key_is_registered():
    """A typo'd HEADLINE/EXTENDED/RETIRED name would silently charge
    FAIL_PENALTY at bench time — catch it at test time instead."""
    from graph_database_project_spark.registry import all_queries

    keys = set(all_queries())
    missing = [n for n in bench.HEADLINE + bench.EXTENDED + bench.RETIRED
               if n not in keys]
    assert not missing, missing


def test_retired_set_disjoint_and_policy_shape():
    """v2.8 wall policy invariants: no row is both active and retired,
    the seam canaries never retire, and the active extended set stays
    small enough that a full rep sits under the 1-minute Python-worker
    reaper (the policy's point)."""
    overlap = set(bench.EXTENDED) & set(bench.RETIRED)
    assert not overlap, overlap
    for canary in ("stream_tumbling_hourly", "multimodal_png_decode"):
        assert canary in bench.EXTENDED
        assert canary not in bench.RETIRED
    # r15 re-decision: the motif family cannot retire while its
    # compiler is the active build front (pattern.py changes every
    # round un-retire it), so the floor is 2 canaries + the motif rows;
    # node2vec retired (pin stamped, mis_luby keeps the codegen canary)
    # to offset the three corpus-sized r15 rows. Re-decide again here.
    assert len(bench.EXTENDED) <= 24

"""Registry invariants: oracle keys ⊆ query keys, no duplicate names, and
the documented rows-only set is exactly the declared one."""

from __future__ import annotations

from graph_database_project_spark.registry import all_oracles, all_queries

EXPECTED_ROWS_ONLY = {
    "graph_pagerank",        # iterative-with-aggregation, no recursive-CTE oracle
    "multimodal_decode",     # Python stub seams
    "multimodal_resize",
    "multimodal_frame_sample",
    "xml_khop_flagship",     # XML-ingested graph — no DuckDB view
    "xml_label_counts",
    "xml_rel_signatures",
    "xml_shared_linenumbers",
}


def test_oracles_subset_of_queries():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)


def test_rows_only_set_is_exactly_documented():
    qs, os_ = all_queries(), all_oracles()
    assert set(qs) - set(os_) == EXPECTED_ROWS_ONLY


def test_all_callables():
    for name, fn in all_queries().items():
        assert callable(fn), name

"""Defensive parsing of SPARK_GRAFT_SHUFFLE_PARTITIONS (r15 advice):
an empty / junk / non-positive value must fall back to the default
instead of raising in every session build or handing Spark an invalid
conf. Pure unit tests — no Spark session."""

from __future__ import annotations

import pytest

from graph_database_project_spark.session import (
    DEFAULT_SHUFFLE_PARTITIONS,
    _env_shuffle_partitions,
)


def test_unset_yields_falsy(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    assert _env_shuffle_partitions() == 0


@pytest.mark.parametrize("raw", ["", "  ", "abc", "12x", "-4", "0", "1.5"])
def test_junk_falls_back_without_raising(monkeypatch, raw):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raw)
    # junk values warn (except empty, which is silently unset-equivalent)
    assert _env_shuffle_partitions() == 0


def test_positive_integer_honored(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")
    assert _env_shuffle_partitions() == 256
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", " 64 ")
    assert _env_shuffle_partitions() == 64


def test_fallback_is_the_documented_default():
    assert DEFAULT_SHUFFLE_PARTITIONS == 32

"""Scalar string functions re-expressing the reference's extraction and
sanitization helpers as Catalyst column expressions (SURVEY.md §2.A #14-16,
#22-23). All JVM built-ins — usable in any query without leaving codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

AIRPLANE_MARKER = " Airplane(s), line number(s) "


def sanitize_relationship(col: Column | str) -> Column:
    """Uppercase, non-alphanumerics → '_' (new-converter.js:44-46
    sanitizeRelationship; latest.js:16-18 sanitizeLabel)."""
    return F.upper(F.regexp_replace(col, "[^a-zA-Z0-9]", "_"))


def format_node_label(col: Column | str) -> Column:
    """Strip HAS_ prefix, snake → Title_Case (new-converter.js:48-55
    formatNodeLabel)."""
    stripped = F.lower(F.regexp_replace(col, "^HAS_", ""))
    return F.concat_ws(
        "_",
        F.transform(
            F.split(stripped, "_"),
            lambda w: F.concat(F.upper(F.substring(w, 1, 1)), F.substring(w, 2, 1000)),
        ),
    )


def tag_prefix_numeric(col: Column | str) -> Column:
    """Tags starting with a digit get a Tag_ prefix (latest.js:23)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike("^[0-9]"), F.concat(F.lit("Tag_"), c)).otherwise(c)


def extract_content(col: Column | str, tag: str) -> Column:
    """First <tag>…</tag> body, trimmed (xml2neo.py:44-47 extract_content —
    non-greedy first match)."""
    return F.trim(F.regexp_extract(col, f"<{tag}>(.*?)</{tag}>", 1))


def extract_nested_content(col: Column | str, tag: str) -> Column:
    """Greedy variant to the *last* closing tag (xml2neo.py:50-53
    extract_nested_content)."""
    return F.trim(F.regexp_extract(col, f"<{tag}>(.*)</{tag}>", 1))


def parse_airplanes(col: Column | str) -> Column:
    """The <airplanes> micro-format (xml2neo.py:56-65): LHS whitespace-split
    airplane types ('and' dropped), RHS comma-split line-number tokens.
    Returns struct(types: array<string>, line_numbers: array<string>).
    Range tokens like '6975-6976' are kept verbatim (reference behavior)."""
    c = F.col(col) if isinstance(col, str) else col
    # \Q…\E: the marker contains regex metachars ("(s)") — quote literally
    parts = F.split(c, "\\Q" + AIRPLANE_MARKER + "\\E")
    types = F.filter(
        F.split(F.trim(parts.getItem(0)), "\\s+"),
        lambda t: (t != "") & (t != "and"),
    )
    lines = F.filter(
        F.transform(F.split(parts.getItem(1), ","), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return F.struct(types.alias("types"), lines.alias("line_numbers"))

"""Round-10 units: the WARC record-boundary fix (anchored Column split +
the strict Content-Length walker), html entity decode ordering, the
search-index bucket-count validation, the modularity hint removal, and
the stdlib PNG codec.  Each behavior here is either a fixed hazard from
the round-9 advice (payload collisions, &amp; double-decode, silent
bucket mis-routing, forced |V|-row broadcast) or a new decode path that
the registry gate value-checks end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ WARC boundaries ---

# A response whose PAYLOAD mentions the version string mid-line and after a
# single newline: a conformant reader keeps the record whole.  Before the
# boundary-anchored split, 'WARC/1.0\r\n' ANYWHERE fragmented the record.
WARC_COLLIDING = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Record-ID: <urn:uuid:aaa-111>\r\n"
    "WARC-Target-URI: http://example.com/a\r\n"
    "Content-Length: 32\r\n"
    "\r\n"
    "the spec says:\nWARC/1.0\r\nis fine\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Record-ID: <urn:uuid:bbb-222>\r\n"
    "WARC-Target-URI: http://example.com/b\r\n"
    "Content-Length: 5\r\n"
    "\r\n"
    "hello\r\n"
)

# A payload containing a FULL record boundary (blank line + version line):
# only the strict Content-Length walker keeps this one whole.
WARC_BOUNDARY_IN_PAYLOAD = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Record-ID: <urn:uuid:ccc-333>\r\n"
    "WARC-Target-URI: http://example.com/c\r\n"
    "Content-Length: 28\r\n"
    "\r\n"
    "quoted:\r\n\r\nWARC/1.0\r\ngotcha!\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Record-ID: <urn:uuid:ddd-444>\r\n"
    "WARC-Target-URI: http://example.com/d\r\n"
    "Content-Length: 3\r\n"
    "\r\n"
    "end\r\n"
)


def _write_warc(tmp_path, name: str, text: str):
    d = tmp_path / name
    d.mkdir()
    (d / "f.warc").write_text(text)
    return str(d)


def test_column_parse_survives_version_string_in_payload(spark, tmp_path):
    from adtl_spark.sources.io import parse_warc_records, read_text_dir

    path = _write_warc(tmp_path, "w1", WARC_COLLIDING)
    rows = {
        r["rec_pos"]: r
        for r in parse_warc_records(
            read_text_dir(spark, path, whole_files=True)
        ).collect()
    }
    assert len(rows) == 2
    assert rows[0]["content"] == "the spec says:\nWARC/1.0\r\nis fine"
    assert rows[0]["content_length"] == 32
    assert rows[1]["content"] == "hello"


def test_strict_parse_equals_column_parse_on_conformant_archive(
    spark, tmp_path
):
    from adtl_spark.sources.io import (
        parse_warc_records,
        parse_warc_records_strict,
        read_text_dir,
    )

    path = _write_warc(tmp_path, "w2", WARC_COLLIDING)
    files = read_text_dir(spark, path, whole_files=True)
    col_rows = sorted(
        parse_warc_records(files).collect(), key=lambda r: r["rec_pos"]
    )
    strict_rows = sorted(
        parse_warc_records_strict(files).collect(), key=lambda r: r["rec_pos"]
    )
    assert [tuple(r) for r in col_rows] == [tuple(r) for r in strict_rows]


def test_strict_parse_survives_full_boundary_in_payload(spark, tmp_path):
    from adtl_spark.sources.io import (
        parse_warc_records,
        parse_warc_records_strict,
        read_text_dir,
    )

    path = _write_warc(tmp_path, "w3", WARC_BOUNDARY_IN_PAYLOAD)
    files = read_text_dir(spark, path, whole_files=True)
    strict = {
        r["rec_pos"]: r for r in parse_warc_records_strict(files).collect()
    }
    assert len(strict) == 2
    assert strict[0]["content"] == "quoted:\r\n\r\nWARC/1.0\r\ngotcha!"
    assert strict[1]["content"] == "end"
    # the Column path documents this exact failure mode: it fragments
    col = parse_warc_records(files).collect()
    assert len(col) != 2 or col[0]["content"] != strict[0]["content"]


def test_strict_parse_no_content_length_trims_padding(spark, tmp_path):
    from adtl_spark.sources.io import parse_warc_records_strict, read_text_dir

    raw = (
        "WARC/1.0\r\n"
        "WARC-Type: request\r\n"
        "WARC-Target-URI: http://example.com/q\r\n"
        "\r\n"
        "GET /q HTTP/1.1\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/r\r\n"
        "Content-Length: 2\r\n"
        "\r\n"
        "ok\r\n"
    )
    path = _write_warc(tmp_path, "w4", raw)
    rows = {
        r["rec_pos"]: r
        for r in parse_warc_records_strict(
            read_text_dir(spark, path, whole_files=True)
        ).collect()
    }
    assert rows[0]["content_length"] is None
    assert rows[0]["content"] == "GET /q HTTP/1.1"
    assert rows[1]["content"] == "ok"


# ------------------------------------------------- entity decode order ---


def test_html_escaped_entities_do_not_double_decode(spark):
    from adtl_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [("<p>write &amp;lt; for &lt; and &amp;amp; for &amp;</p>",)],
        "html string",
    )
    out = df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "write &lt; for < and &amp; for &"


# ------------------------------------------- index bucket validation ---


def test_append_rejects_mismatched_bucket_count(spark, tmp_path):
    from adtl_spark.operators.retrieval import (
        append_to_search_index,
        write_search_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    write_search_index(docs, path, n_buckets=8)
    batch = spark.createDataFrame([(3, "delta")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        append_to_search_index(batch, path, n_buckets=16)
    # matching explicit count and meta-resolved count both still work
    append_to_search_index(batch, path, n_buckets=8)


# ------------------------------------------------- modularity plan ---


def test_modularity_label_join_broadcasts_via_aqe_not_hint(spark):
    """The |V|-row label vector carries NO forced broadcast hint (a hint
    OOMs at web-scale |V|); at small scale AQE must still pick broadcast
    joins for it, so the plan keeps the zero-shuffle shape."""
    from adtl_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1), (3, 4, 1), (4, 3, 1)], "src long, dst long, w long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "v long, community long"
    )
    row = modularity(edges, labels).collect()[0]
    assert row["n_communities"] == 2 and row["modularity"] == 0.5
    # no forced hint anywhere in the label joins
    import inspect

    src = inspect.getsource(modularity)
    assert "F.broadcast(lab" not in src

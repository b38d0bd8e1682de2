"""Round-13 block: crawl-frontier realism (sitemapindex recursion,
robots auxiliary directives, charset-aware WET extraction), the
pluggable codec registry, crash-safe index compaction, and the round's
ADVICE fixes (apply_robots cardinality, pdf_lite stream-extent
collisions, compression_signal id_col)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE fixes


def test_apply_robots_preserves_duplicate_rows(spark):
    """Fully-duplicate URL rows (routine in a raw crawl log) must come
    back with their cardinality intact, not collapsed by the post-join
    reassembly."""
    from adtl_spark.operators.text import apply_robots, parse_robots

    rules = parse_robots("User-agent: *\nDisallow: /private/\n")
    urls = spark.createDataFrame(
        [("http://x.test/private/a",)] * 3 + [("http://x.test/ok",)] * 2,
        "url string",
    )
    out = apply_robots(urls, rules).collect()
    assert len(out) == 5
    blocked = [r for r in out if not r["allowed"]]
    assert len(blocked) == 3
    assert all(r["rule"] == "/private/" for r in blocked)


def test_pdf_scan_objects_stream_collisions():
    """A spurious 'N G obj' pattern inside a stream must not clobber
    the real object N, and 'endobj' bytes inside a /Length stream must
    not truncate its extent."""
    from adtl_spark.operators.pdf_lite import _scan_objects

    clobber = (
        b"%PDF-1.7\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
        b"9 0 obj\n<< /Length 20 >>\nstream\n"
        b"1 0 obj clobber doom\nendstream\nendobj\n"
    )
    objs = _scan_objects(clobber)
    assert b"/Type /Catalog" in objs[1][0]
    assert objs[9][1] == b"1 0 obj clobber doom"

    truncating = (
        b"%PDF-1.7\n3 0 obj\n<< /Length 14 >>\nstream\n"
        b"xx endobj yy Z\nendstream\nendobj\n"
        b"4 0 obj\n<< /K 1 >>\nendobj\n"
    )
    objs = _scan_objects(truncating)
    assert objs[3][1] == b"xx endobj yy Z"
    assert 4 in objs


def test_compression_signal_id_col(spark):
    from adtl_spark.operators.text import compression_signal

    df = spark.createDataFrame(
        [(5, "some text " * 20), (6, "")], "item_id long, body string"
    )
    out = compression_signal(df, text_col="body", id_col="item_id")
    rows = {r["item_id"]: r for r in out.collect()}
    assert out.columns == ["item_id", "n_bytes", "ratio_q4"]
    assert rows[5]["n_bytes"] == 200 and rows[5]["ratio_q4"] is not None
    assert rows[6]["n_bytes"] == 0 and rows[6]["ratio_q4"] is None

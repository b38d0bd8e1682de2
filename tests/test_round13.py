"""Round-13 block: crawl-frontier realism (sitemapindex recursion,
robots auxiliary directives, charset-aware WET extraction), the
pluggable codec registry, crash-safe index compaction, and the round's
ADVICE fixes (apply_robots cardinality, pdf_lite stream-extent
collisions, compression_signal id_col)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Pluggable codec registry


def test_codec_registry_injects_through_operators(spark):
    """A registered decoder must reach the executors through the
    plan-time snapshot: the multimodal operators pick up the override
    without any operator-code change, and MP3 — the seam's first
    production use — decodes once a codec is registered."""
    import numpy as np

    from adtl_spark.operators import multimodal as M

    fake_pcm = np.array([100, -200, 300, -400], dtype=np.int16).tobytes()

    def fake_mp3(payload):
        return (8000, 1, 16, fake_pcm)

    def fake_ppm(payload):
        return (2, 2, bytes([10, 20, 30] * 4))

    # a real Layer-III header stream: the in-repo default now decodes
    # Layer I/II natively, so the seam's remaining production use is
    # Layer III — the stub raises and names the seam on it
    mp3_payload = M.build_mpeg_audio([128, 128], layer=3)
    with pytest.raises(NotImplementedError, match="register_decoder"):
        M.decode_audio(mp3_payload)
    M.register_decoder("mp3", fake_mp3)
    M.register_decoder("ppm", fake_ppm)
    try:
        audio = spark.createDataFrame(
            [(1, mp3_payload)], "media_id long, payload binary"
        )
        row = M.extract_audio_features(audio).collect()[0]
        assert (row["sample_rate"], row["channels"], row["bits"]) == (
            8000, 1, 16,
        )
        assert row["n_samples"] == 4 and row["peak"] == 400
        # image op sees the fake ppm decode (real P6 header, fake pixels)
        img = spark.createDataFrame(
            [(2, b"P6\n1 1\n255\n\x00\x00\x00")],
            "media_id long, payload binary",
        )
        st = M.image_pixel_stats(img).collect()[0]
        assert (st["width"], st["height"]) == (2, 2)
        assert st["sum_r"] == 40 and st["sum_g"] == 80 and st["sum_b"] == 120
    finally:
        M.unregister_decoder("mp3")
        M.unregister_decoder("ppm")
    with pytest.raises(NotImplementedError):
        M.decode_audio(mp3_payload)
    # real decode restored after unregister
    st = M.image_pixel_stats(
        spark.createDataFrame(
            [(3, b"P6\n1 1\n255\n\x05\x06\x07")],
            "media_id long, payload binary",
        )
    ).collect()[0]
    assert (st["width"], st["height"], st["sum_r"]) == (1, 1, 5)
    with pytest.raises(ValueError):
        M.register_decoder("gif", lambda b: None)


# ---------------------------------------------------------------------------
# Property tests: charset decode + XML entity round trips


def test_decode_http_response_roundtrip_property():
    """For random text and any declaration path (header, BOM, meta),
    encode->decode is the identity on every charset that can represent
    the text; the resolved charset is the canonical name of what was
    declared.  Pure-Python property (no Spark session needed)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adtl_spark.sources.io import decode_http_response

    cp1252_ok = st.text(
        alphabet="abcXYZ 123éü–€Ÿ", max_size=60
    )

    @settings(max_examples=120, deadline=None)
    @given(
        text=cp1252_ok,
        path=st.sampled_from(["header", "bom16", "meta", "plain_utf8"]),
    )
    def run(text, path):
        if path == "header":
            body = text.encode("cp1252")
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                b"charset=windows-1252\r\n\r\n" + body
            )
            want_cs = "cp1252"
        elif path == "bom16":
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + b"\xff\xfe"
                + text.encode("utf-16-le")
            )
            want_cs = "utf-16-le"
        elif path == "meta":
            html = '<meta charset="utf-8">' + text
            payload = (
                b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n"
                + html.encode("utf-8")
            )
            want_cs = "utf-8"
            text = html
        else:
            payload = b"HTTP/1.1 200 OK\r\n\r\n" + text.encode("utf-8")
            want_cs = "utf-8"
        status, cs, out = decode_http_response(payload)
        assert status == 200 and cs == want_cs and out == text

    run()


def test_xml_unescape_escape_roundtrip_property(spark):
    """escape(text) -> xml_unescape == identity for random text over
    the five predefined entities' characters — the decode order (&amp;
    last) is exactly what makes this hold."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adtl_spark.operators.text import xml_unescape

    def esc(s: str) -> str:
        s = s.replace("&", "&amp;")
        s = s.replace("<", "&lt;").replace(">", "&gt;")
        return s.replace('"', "&quot;").replace("'", "&apos;")

    @settings(max_examples=25, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ab<>&\"' ;ampltgtquos", max_size=30),
            min_size=1,
            max_size=6,
        )
    )
    def run(texts):
        df = spark.createDataFrame(
            [(i, esc(t)) for i, t in enumerate(texts)], "i long, s string"
        )
        got = {
            r["i"]: r["d"]
            for r in df.select("i", xml_unescape(F.col("s")).alias("d"))
            .collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == t

    run()


# ---------------------------------------------------------------------------
# Text prep: script histogram + NFC normalization


def test_script_profile_counts_and_dominant(spark):
    from adtl_spark.operators.text import script_profile

    df = spark.createDataFrame(
        [
            (1, "abc где 123"),      # latin 3, cyrillic 3 -> tie: latin
            (2, "漢字 ωμ"),           # han 2, greek 2 -> tie: han
            (3, "123 !?"),           # no script chars -> none
            (4, "мир мир a"),        # cyrillic dominant
            (5, None),               # null text -> zero counts, none
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert (rows[1]["n_latin"], rows[1]["n_cyrillic"]) == (3, 3)
    assert rows[1]["dominant"] == "latin"  # fixed-order tie-break
    assert rows[2]["dominant"] == "han"
    assert rows[3]["dominant"] == "none"
    assert rows[4]["dominant"] == "cyrillic" and rows[4]["n_cyrillic"] == 6
    assert rows[5]["dominant"] == "none"


def test_normalize_unicode_nfc(spark):
    from adtl_spark.operators.text import normalize_unicode

    decomposed = "cafe\u0301 + A\u030angstro\u0308m"
    df = spark.createDataFrame(
        [(1, decomposed), (2, "plain"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_unicode(df).collect()}
    assert rows[1]["text_nfc"] == "caf\u00e9 + \u00c5ngstr\u00f6m"
    assert rows[1]["n_chars_before"] == len(decomposed)
    assert rows[1]["n_chars_after"] == len(decomposed) - 3
    assert rows[2]["text_nfc"] == "plain"
    assert rows[3]["text_nfc"] == "" and rows[3]["n_chars_before"] == 0
    # NFKC runs through the same path (no SQL twin, documented)
    nfkc = {
        r["doc_id"]: r["text_nfc"]
        for r in normalize_unicode(
            spark.createDataFrame([(1, "ﬁt ①")], "doc_id long, text string"),
            form="NFKC",
        ).collect()
    }
    assert nfkc[1] == "fit 1"


# ---------------------------------------------------------------------------
# n-gram novelty


def test_ngram_novelty_reference_members_score_zero(spark):
    from adtl_spark.operators.corpus import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),   # exact copy of a ref doc
            (3, "a completely different line here"),
            (4, "the quick brown fox sleeps"),  # partial overlap
        ],
        "doc_id long, text string",
    )
    ref = docs.filter("doc_id = 1")
    rows = {r["doc_id"]: r for r in ngram_novelty(docs, ref, n=3).collect()}
    assert rows[1]["novelty_ppm"] == 0  # reference member
    assert rows[2]["novelty_ppm"] == 0  # exact copy
    assert rows[3]["novelty_ppm"] == 1_000_000  # fully novel
    # 'the quick brown fox sleeps': 3 trigrams, 2 shared with the
    # reference ('the quick brown', 'quick brown fox') -> 1 novel
    assert rows[4]["n_ngrams"] == 3 and rows[4]["n_novel"] == 1
    assert rows[4]["novelty_ppm"] == 1 * 1_000_000 // 3


# ---------------------------------------------------------------------------
# Corpus quality screens: audio clipping + image blur


def test_audio_clipping_detects_limited_audio(spark):
    import numpy as np

    from adtl_spark.operators import multimodal as M

    quiet = np.full(100, 1000, dtype=np.int16)
    limited = np.array([32760, -32768, 32700, 5, -32699] * 20,
                       dtype=np.int16)
    df = spark.createDataFrame(
        [
            (1, M.pcm_to_wav(16000, 1, 16, quiet.tobytes())),
            (2, M.pcm_to_wav(16000, 1, 16, limited.tobytes())),
            (3, None),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in M.audio_clipping(df).collect()}
    assert rows[1]["n_clipped"] == 0 and rows[1]["clip_ppm"] == 0
    assert rows[1]["peak"] == 1000
    # 32760, -32768, 32700 clip; 5 and -32699 do not
    assert rows[2]["n_clipped"] == 60
    assert rows[2]["clip_ppm"] == 60 * 1_000_000 // 100
    assert rows[2]["peak"] == 32768
    assert rows[3]["n_samples"] is None


def test_image_sharpness_flat_vs_edge(spark):
    from adtl_spark.operators import multimodal as M

    flat = b"P6\n3 3\n255\n" + bytes([50] * 27)
    # center pixel white on black: lap at the single interior pixel =
    # |4*G(255,255,255)| = 4 * (299+587+114) * 255
    edge = b"P6\n3 3\n255\n" + bytes(
        [0] * 12 + [255, 255, 255] + [0] * 12
    )
    tiny = b"P6\n2 2\n255\n" + bytes(12)
    df = spark.createDataFrame(
        [(1, flat), (2, edge), (3, tiny)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in M.image_sharpness(df).collect()}
    assert rows[1]["lap_sum"] == 0 and rows[1]["n_interior"] == 1
    assert rows[2]["lap_sum"] == 4 * 1000 * 255
    assert rows[3]["n_interior"] is None  # no interior below 3x3


# ---------------------------------------------------------------------------
# Preference family: Wilson-lower-bound win rates


def test_winrate_wilson_ranking_safety(spark):
    """The property the operator exists for: a 2-0 small-sample item
    must NOT outrank a 28-7 veteran by the Wilson lower bound, even
    though its raw win rate is higher; loss-only items appear with a
    zero bound; the bound matches the closed form."""
    import math

    from adtl_spark.operators.feedback import winrate_wilson

    pairs = spark.createDataFrame(
        [(1, 99)] * 2 + [(2, 98)] * 28 + [(98, 2)] * 7,
        "winner long, loser long",
    )
    rows = {r["item"]: r for r in winrate_wilson(pairs).collect()}
    assert rows[1]["games"] == 2 and rows[1]["wins"] == 2
    assert rows[1]["winrate"] == 1.0
    assert rows[2]["winrate"] == 28 / 35
    # ranking safety: veteran's lower bound beats the 2-0 newcomer's
    assert rows[2]["wilson_lo"] > rows[1]["wilson_lo"]
    # loss-only items present with p=0 and a zero lower bound
    assert rows[99]["games"] == 2 and rows[99]["wins"] == 0
    assert rows[99]["wilson_lo"] == 0.0
    # closed form at z=1.96
    z, n, p = 1.96, 35.0, 28 / 35
    want = (
        p + z * z / (2 * n)
        - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    ) / (1 + z * z / n)
    assert abs(rows[2]["wilson_lo"] - want) < 1e-12


# ---------------------------------------------------------------------------
# Crash-safe (staged-commit) index compaction


def _bm25_rows(spark, path, qdf):
    from adtl_spark.operators.retrieval import bm25_query_index

    return sorted(
        (r["query_id"], r["doc_id"], r["rank"])
        for r in bm25_query_index(spark, path, qdf, k=5, n_buckets=8).collect()
    )


def test_compaction_crash_at_any_point_serves_pre_state(spark, tmp_path):
    """Compaction is staged-commit like the appends: a crash BEFORE the
    new base's commit marker leaves served results exactly equal to the
    pre-compaction state (old base + deltas untouched), and a crash
    AFTER the marker but BEFORE reclamation must not double-count the
    folded deltas (the folded watermark in the base name excludes
    them).  A compact re-run converges either way."""
    import shutil

    from adtl_spark.operators import retrieval as R

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} tok{i % 5} alpha") for i in range(12)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(0, "tok1 alpha"), (1, "tok2 tok4")], "query_id long, query string"
    )
    path = str(tmp_path / "idx")
    R.write_search_index(docs.filter("doc_id < 5"), path, n_buckets=8)
    R.append_to_search_index(docs.filter("doc_id >= 5 and doc_id < 9"), path)
    R.append_to_search_index(docs.filter("doc_id >= 9"), path)
    want = _bm25_rows(spark, path, qdf)

    # run the real compaction on a CLONE to obtain the exact bytes a
    # compaction writes, then transplant them into the original at the
    # two crash points
    clone = str(tmp_path / "clone")
    shutil.copytree(path, clone)
    R._INDEX_META_CACHE.pop(clone, None)
    R.compact_search_index(spark, clone)
    (base_name,) = [p.name for p in (tmp_path / "clone" / "base").iterdir()]
    assert base_name == "1_2"

    # crash 1: every component written, commit missing -> invisible
    shutil.copytree(
        tmp_path / "clone" / "base" / base_name,
        tmp_path / "idx" / "base" / base_name,
    )
    shutil.rmtree(tmp_path / "idx" / "base" / base_name / "commit")
    assert R._base_state(spark, path) == (path, 0)
    assert _bm25_rows(spark, path, qdf) == want

    # crash 2: commit landed, reclamation never ran -> the folded
    # watermark keeps the (still present) deltas out of the union, so
    # nothing double-counts
    shutil.copytree(
        tmp_path / "clone" / "base" / base_name / "commit",
        tmp_path / "idx" / "base" / base_name / "commit",
    )
    assert R._base_state(spark, path) == (f"{path}/base/{base_name}", 2)
    assert (tmp_path / "idx" / "delta" / "1").exists()  # not yet reclaimed
    assert _bm25_rows(spark, path, qdf) == want

    # re-run finishes reclamation and converges; results unchanged
    R.compact_search_index(spark, path)
    assert R._delta_gens(spark, path) == ([], [])
    assert not (tmp_path / "idx" / "postings").exists()  # legacy reclaimed
    assert _bm25_rows(spark, path, qdf) == want

    # appends after compaction respect the folded watermark: the next
    # generation is folded_upto+1, never a reused number
    extra = spark.createDataFrame(
        [(100, "alpha tok1 zeta")], "doc_id long, text string"
    )
    R.append_to_search_index(extra, path)
    assert R._delta_gens(spark, path) == ([3], [3])
    full = str(tmp_path / "full")
    R.write_search_index(docs.unionByName(extra), full, n_buckets=8)
    assert _bm25_rows(spark, path, qdf) == _bm25_rows(spark, full, qdf)

    # second compaction folds onto the compacted base (gen 2, folded 3)
    R.compact_search_index(spark, path)
    assert R._base_state(spark, path) == (f"{path}/base/2_3", 3)
    assert _bm25_rows(spark, path, qdf) == _bm25_rows(spark, full, qdf)


def test_compaction_interleaved_with_appends_randomized(spark, tmp_path):
    """Deterministic-seed randomized sequences of append/compact against
    one index path: after EVERY step, querying the maintained index
    equals a from-scratch build over the documents ingested so far —
    the invariant that makes compaction safe to schedule anywhere in an
    ingestion timeline."""
    import random

    from adtl_spark.operators import retrieval as R

    rng = random.Random(1307)
    vocab = ["alpha", "beta", "gamma", "delta", "tok1", "tok2", "tok3"]
    qdf = spark.createDataFrame(
        [(0, "alpha tok1"), (1, "beta gamma tok3")],
        "query_id long, query string",
    )
    path = str(tmp_path / "idx")
    next_id = 0

    def batch(k):
        nonlocal next_id
        rows = [
            (next_id + i, " ".join(rng.choices(vocab, k=rng.randint(2, 6))))
            for i in range(k)
        ]
        next_id += k
        return spark.createDataFrame(rows, "doc_id long, text string")

    ingested = batch(4)
    R.write_search_index(ingested, path, n_buckets=8)
    for step in range(5):
        if step in (2, 4):
            R.compact_search_index(spark, path)
        else:
            b = batch(rng.randint(1, 3))
            R.append_to_search_index(b, path)
            ingested = ingested.unionByName(b)
        fresh = str(tmp_path / f"fresh{step}")
        R.write_search_index(ingested, fresh, n_buckets=8)
        assert _bm25_rows(spark, path, qdf) == _bm25_rows(spark, fresh, qdf), (
            f"diverged at step {step}"
        )
    # double compaction in a row is a safe no-op
    R.compact_search_index(spark, path)
    R.compact_search_index(spark, path)
    fresh = str(tmp_path / "fresh_final")
    R.write_search_index(ingested, fresh, n_buckets=8)
    assert _bm25_rows(spark, path, qdf) == _bm25_rows(spark, fresh, qdf)


def test_write_search_index_rebuild_clears_old_generations(spark, tmp_path):
    """Rebuilding an index under a path that previously had appends and
    a compacted base must not serve ghosts from the old life."""
    from adtl_spark.operators import retrieval as R

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    qdf = spark.createDataFrame([(0, "alpha gamma")],
                                "query_id long, query string")
    path = str(tmp_path / "idx")
    R.write_search_index(docs, path, n_buckets=8)
    R.append_to_search_index(
        spark.createDataFrame([(3, "alpha alpha")], "doc_id long, text string"),
        path,
    )
    R.compact_search_index(spark, path)
    R.write_search_index(docs, path, n_buckets=8)
    fresh = str(tmp_path / "fresh")
    R.write_search_index(docs, fresh, n_buckets=8)
    assert _bm25_rows(spark, path, qdf) == _bm25_rows(spark, fresh, qdf)
    assert R._base_state(spark, path) == (path, 0)
    assert R._delta_gens(spark, path) == ([], [])


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


# ---------------------------------------------------------------------------
# Crawl frontier: sitemapindex recursion + XML entity decoding


def test_parse_sitemap_any_mixed_corpus(spark):
    from adtl_spark.operators.text import parse_sitemap, parse_sitemap_any

    idx = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://a/sm?x=1&amp;y=2</loc>"
        "<lastmod>2024-05-01</lastmod></sitemap>"
        "<sitemap><loc> http://a/sm2.xml </loc></sitemap></sitemapindex>"
    )
    us = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://a/p?q=&quot;v&quot;&amp;amp;r</loc></url>"
        "<url><loc>http://a/p2</loc><lastmod>2024-01-02</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [(1, idx), (2, us)], "doc_id long, xml string"
    )
    rows = sorted(
        tuple(r) for r in parse_sitemap_any(df).collect()
    )
    assert rows == [
        (1, 0, "sitemap", "http://a/sm?x=1&y=2", "2024-05-01"),
        (1, 1, "sitemap", "http://a/sm2.xml", None),
        # &amp;amp; decodes ONE level (to &amp;), never two
        (2, 0, "url", 'http://a/p?q="v"&amp;r', None),
        (2, 1, "url", "http://a/p2", "2024-01-02"),
    ]
    # parse_sitemap must NOT leak index children as page URLs
    assert parse_sitemap(df).count() == 2
    assert parse_sitemap(df.filter("doc_id = 1")).count() == 0


def test_robots_directives():
    from adtl_spark.operators.text import parse_robots, robots_directives

    txt = (
        "Sitemap: http://x/sm-global.xml\n"
        "User-agent: fastbot\n"
        "Crawl-delay: 0.5\n"
        "Disallow: /a\n"
        "User-agent: *\n"
        "Crawl-delay: 2.5\n"
        "Crawl-delay: 9\n"  # first non-None wins within the group
        "Disallow: /b\n"
        "Sitemap: http://x/sm-tail.xml\n"
        "User-agent: fastbot\n"  # merged same-agent group, no delay
        "Disallow: /c\n"
    )
    d = robots_directives(txt, agent="fastbot/1.0")
    # group-scoped delay from the winning group; file-scoped sitemaps
    assert d["crawl_delay"] == 0.5
    assert d["sitemaps"] == [
        "http://x/sm-global.xml",
        "http://x/sm-tail.xml",
    ]
    assert robots_directives(txt, agent="otherbot")["crawl_delay"] == 2.5
    # no matching group at all -> no delay, sitemaps still global
    assert robots_directives("Sitemap: http://x/s.xml")["crawl_delay"] is None
    assert robots_directives("Sitemap: http://x/s.xml")["sitemaps"] == [
        "http://x/s.xml"
    ]
    # unparseable value treated as absent
    assert (
        robots_directives("User-agent: *\nCrawl-delay: soon\nDisallow: /x")[
            "crawl_delay"
        ]
        is None
    )
    # crawl-delay opens the group body: a later User-agent starts a NEW
    # group, and rule merging across same-agent groups still holds
    assert parse_robots(txt, agent="fastbot/1.0") == [
        (False, "/a"),
        (False, "/c"),
    ]


def test_schedule_frontier_politeness(spark):
    from adtl_spark.operators.text import schedule_frontier

    urls = spark.createDataFrame(
        [
            ("http://A.test/2",),
            ("http://a.test/1",),
            ("https://b.test:8080/x",),
            ("not a url",),
        ],
        "url string",
    )
    delays = spark.createDataFrame(
        [("a.test", 100)], "host string, delay_ms long"
    )
    rows = {r["url"]: r for r in schedule_frontier(urls, delays).collect()}
    # case-insensitive host grouping: one queue, delay from the table
    assert rows["http://a.test/1"]["host"] == "a.test"
    assert rows["http://A.test/2"]["host"] == "a.test"
    assert rows["http://a.test/1"]["fetch_seq"] == 2  # 'A' sorts before 'a'
    assert rows["http://A.test/2"]["fetch_after_ms"] == 0
    assert rows["http://a.test/1"]["fetch_after_ms"] == 100
    assert (
        rows["http://a.test/1"]["shard"] == rows["http://A.test/2"]["shard"]
    )
    # port STRIPPED from the host key (round-14 ADVICE fix: decorated
    # authorities share the bare host's queue); unknown host -> default
    assert rows["https://b.test:8080/x"]["host"] == "b.test"
    assert rows["https://b.test:8080/x"]["fetch_after_ms"] == 0
    # non-URL rows: NULL host, still scheduled (documented)
    assert rows["not a url"]["host"] is None


def test_xml_unescape_order(spark):
    from adtl_spark.operators.text import xml_unescape

    df = spark.createDataFrame(
        [("&lt;a&gt; &apos;x&apos; &quot;y&quot; &amp;lt;raw",)], "s string"
    )
    out = df.select(xml_unescape(df.s).alias("d")).collect()[0]["d"]
    assert out == "<a> 'x' \"y\" &lt;raw"


# ---------------------------------------------------------------------------
# Charset-aware WET extraction (binary WARC path)


def test_decode_http_response_precedence():
    from adtl_spark.sources.io import decode_http_response

    def mk(body, ct=None):
        h = b"HTTP/1.1 200 OK\r\nServer: t"
        if ct:
            h += b"\r\nContent-Type: " + ct
        return h + b"\r\n\r\n" + body

    # header charset, canonical codec name
    s, c, t = decode_http_response(
        mk("déjà–vu €".encode("cp1252"), b"text/html; charset=windows-1252")
    )
    assert (s, c, t) == (200, "cp1252", "déjà–vu €")
    # BOM beats a (wrong) header declaration
    s, c, t = decode_http_response(
        mk(b"\xff\xfe" + "日本語".encode("utf-16-le"),
           b"text/html; charset=utf-8")
    )
    assert (c, t) == ("utf-16-le", "日本語")
    # meta-only declaration, both syntaxes
    html = '<meta charset="iso-8859-1"><p>niño</p>'.encode("latin-1")
    assert decode_http_response(mk(html, b"text/html"))[1] == "iso8859-1"
    html = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=KOI8-R">' + "да".encode("koi8_r")
    )
    s, c, t = decode_http_response(mk(html))
    assert c == "koi8-r" and t.endswith("да")
    # unknown label falls through; broken bytes never raise
    assert decode_http_response(mk(b"ok", b"x; charset=klingon"))[1] == "utf-8"
    s, c, t = decode_http_response(mk(b"\xff\xfa oops"))
    assert c == "utf-8" and "�" in t
    # headless payload: whole thing is the body, no status
    assert decode_http_response("café".encode()) == (None, "utf-8", "café")
    # utf-8 BOM stripped, not rendered
    assert decode_http_response(mk(b"\xef\xbb\xbfabc"))[2] == "abc"


def test_parse_warc_records_bytes_byte_lengths(spark):
    """Content-Length counts BYTES: a utf-16 payload (2x its char
    count) must round-trip intact through the binary walk, and the
    next record must still parse at the right offset."""
    from adtl_spark.sources.io import (
        http_text_records,
        parse_warc_records_bytes,
    )

    b1 = b"\xff\xfe" + "日本語 café".encode("utf-16-le")
    b2 = "plain".encode()
    recs = b"".join(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"WARC-Target-URI: http://t/{i}\r\n".encode()
        + f"Content-Length: {len(b)}\r\n\r\n".encode()
        + b
        + b"\r\n\r\n"
        for i, b in enumerate([b1, b2])
    )
    files = spark.createDataFrame([(recs,)], "content binary")
    parsed = parse_warc_records_bytes(files)
    rows = {r["rec_pos"]: r for r in parsed.collect()}
    assert len(rows) == 2
    assert bytes(rows[0]["content"]) == b1
    assert rows[0]["content_length"] == len(b1)
    assert bytes(rows[1]["content"]) == b2
    out = {
        r["rec_pos"]: r
        for r in http_text_records(
            parsed, passthrough=("rec_pos",)
        ).collect()
    }
    # headless HTTP payload: BOM still resolves the charset
    assert out[0]["charset"] == "utf-16-le"
    assert out[0]["text"] == "日本語 café"
    assert out[1]["text"] == "plain"


def test_fetch_gzip_members_binary(spark):
    from adtl_spark.sources.io import (
        fetch_gzip_members,
        gzip_member_records,
        gzip_members_bytes,
    )

    payloads = [b"\xff\xferaw-bytes", "caf\xe9".encode("cp1252")]
    blob = gzip_members_bytes(payloads)
    archives = spark.createDataFrame(
        [(1, blob)], "archive_id long, content binary"
    )
    members = gzip_member_records(
        archives, encoding=None, passthrough=("archive_id",)
    )
    manifest = members.select("archive_id", "member_off", "member_len",
                              "member_pos")
    got = {
        r["member_pos"]: bytes(r["value"])
        for r in fetch_gzip_members(
            archives, manifest, encoding=None
        ).collect()
    }
    assert got == {0: payloads[0], 1: payloads[1]}


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

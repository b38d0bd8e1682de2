"""Round-8 operator units: the IVF-PQ composite ANN index, chi-square
categorical drift, embedding centroid drift, and hard-negative mining.
Each operator's oracle twin is exercised by the registry gate
(tools/check_oracle.py); these tests pin the SEMANTICS against
straight-line Python replays on small inputs, plus the edge cases the
gate corpus never hits (one-sided-empty snapshots, one-sided labels,
all-same-label corpora)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


# -------------------------------------------------------------- IVF-PQ --
def _py_ivfpq(vecs, n_centroids, n_probe, m, ks, k, dim):
    """Straight-line replay of similarity.ann_ivfpq's conventions:
    lowest-id centroids/codebooks, (-dot/|c|, cid) probe ranking,
    per-subspace 1e-9-quantized ADC, (qdist, corpus_id) top-k."""
    d_sub = dim // m
    ids = sorted(vecs)
    cents = []
    for cid in ids[:n_centroids]:
        v = vecs[cid]
        cents.append((cid, v, _fold_dot(v, v) ** 0.5))
    books = []
    for j in range(m):
        books.append(
            [
                (code, vecs[i][j * d_sub : (j + 1) * d_sub])
                for code, i in enumerate(ids[:ks])
            ]
        )

    def cell_of(v):
        return sorted(
            (-(_fold_dot(v, cv)) / nrm, cid) for cid, cv, nrm in cents
        )[0][1]

    def codes_of(v):
        out = []
        for j in range(m):
            sv = v[j * d_sub : (j + 1) * d_sub]
            scored = sorted(
                (
                    0.5 * _fold_dot(cv, cv) - _fold_dot(sv, cv),
                    code,
                )
                for code, cv in books[j]
            )
            out.append(scored[0][1])
        return out

    cells = {i: cell_of(v) for i, v in vecs.items()}
    codes = {i: codes_of(v) for i, v in vecs.items()}
    results = {}
    for qid, qv in vecs.items():
        probed = [
            cid
            for _, cid in sorted(
                (-(_fold_dot(qv, cv)) / nrm, cid) for cid, cv, nrm in cents
            )[:n_probe]
        ]
        cand = []
        for cid, v in vecs.items():
            if cid == qid or cells[cid] not in probed:
                continue
            qdist = 0
            for j in range(m):
                sq = qv[j * d_sub : (j + 1) * d_sub]
                cv = books[j][codes[cid][j]][1]
                d = (
                    _fold_dot(sq, sq)
                    - 2 * _fold_dot(sq, cv)
                    + 2.0 * (0.5 * _fold_dot(cv, cv))
                )
                qdist += int(math.floor(d * 1000000000 + 0.5))
            cand.append((qdist, cid))
        results[qid] = sorted(cand)[:k]
    return results


def test_ann_ivfpq_matches_python(spark):
    from adtl_spark.operators.similarity import ann_ivfpq

    dim, m, ks, n_centroids, n_probe, k = 8, 2, 4, 4, 2, 3
    vecs = {
        i: [math.sin(i * 7 + d * 3) * 2 for d in range(dim)] for i in range(12)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = ann_ivfpq(
        df, df, n_centroids=n_centroids, n_probe=n_probe, m=m, ks=ks, k=k,
        dim=dim,
    ).collect()
    want = _py_ivfpq(vecs, n_centroids, n_probe, m, ks, k, dim)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["qdist"], r["corpus_id"])
        )
    for qid, pairs in want.items():
        rows = sorted(by_q[qid])
        assert [(i + 1, d, c) for i, (d, c) in enumerate(pairs)] == rows


def test_ann_ivfpq_candidates_stay_in_probed_cells(spark):
    # the pruning contract: no returned neighbor can live outside the
    # query's probed cells — the property that bounds the scan at scale
    from adtl_spark.operators.similarity import ann_ivfpq

    dim = 4
    vecs = {i: [float((i * 5 + d) % 7) - 3.0 for d in range(dim)] for i in range(20)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = ann_ivfpq(
        df, df.limit(3), n_centroids=5, n_probe=2, m=2, ks=3, k=20, dim=dim
    ).collect()
    want = _py_ivfpq(vecs, 5, 2, 2, 3, 20, dim)
    for r in got:
        assert (r["qdist"], r["corpus_id"]) in want[r["query_id"]]


# ---------------------------------------------------------- chi-square --
def test_chi2_drift_matches_python(spark):
    from adtl_spark.operators.monitor import chi2_drift

    ref_vals = ["a", "a", "a", "b", "b", "c"]
    cur_vals = ["a", "b", "b", "b", "c", "c", "d"]
    ref = spark.createDataFrame([(v,) for v in ref_vals], ["s"])
    cur = spark.createDataFrame([(v,) for v in cur_vals], ["s"])
    out = {r["category"]: r for r in chi2_drift(ref, cur, F.col("s")).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    grand = len(ref_vals) + len(cur_vals)
    for cat in out:
        n_ref = ref_vals.count(cat)
        n_cur = cur_vals.count(cat)
        e_ref = (n_ref + n_cur) * len(ref_vals) / grand
        e_cur = (n_ref + n_cur) * len(cur_vals) / grand
        chi2 = (n_ref - e_ref) ** 2 / e_ref + (n_cur - e_cur) ** 2 / e_cur
        assert out[cat]["n_ref"] == n_ref and out[cat]["n_cur"] == n_cur
        assert out[cat]["e_ref_q6"] == math.floor(e_ref * 1e6 + 0.5)
        assert out[cat]["e_cur_q6"] == math.floor(e_cur * 1e6 + 0.5)
        assert out[cat]["chi2_q6"] == math.floor(chi2 * 1e6 + 0.5)
    # identical snapshots: O == E exactly, every contribution zero
    same = chi2_drift(ref, ref, F.col("s")).collect()
    assert all(r["chi2_q6"] == 0 for r in same)


def test_chi2_drift_one_sided_empty_is_zero(spark):
    # documented convention: homogeneity is undefined without both
    # margins; E collapses to O on the occupied side, so chi2 is 0 and
    # callers read n_ref/n_cur to detect the degenerate case
    from adtl_spark.operators.monitor import chi2_drift

    ref = spark.createDataFrame([("a",), ("b",)], ["s"])
    empty = ref.filter(F.lit(False))
    rows = chi2_drift(ref, empty, F.col("s")).collect()
    assert [(r["category"], r["n_ref"], r["n_cur"]) for r in rows] == [
        ("a", 1, 0),
        ("b", 1, 0),
    ]
    assert all(r["chi2_q6"] == 0 for r in rows)


# ------------------------------------------------------ centroid drift --
def test_centroid_drift_matches_python(spark):
    from adtl_spark.operators.monitor import centroid_drift

    dim = 4
    rows = [
        (0, 0, [1.0, 0.0, 2.0, -1.0]),
        (1, 0, [0.5, 0.25, 1.5, -0.5]),
        (2, 0, [2.0, -0.5, 1.0, 0.0]),
        (3, 0, [1.5, 0.5, 2.5, -1.5]),
        (4, 1, [0.0, 3.0, 0.5, 1.0]),
        (5, 1, [0.25, 2.5, 0.0, 1.5]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    ref = df.filter(F.col("vec_id") % 2 == 0)
    cur = df.filter(F.col("vec_id") % 2 == 1)
    out = {
        r["label"]: r
        for r in centroid_drift(ref, cur, label_col="label").collect()
    }

    def qmean(vals):
        qs = sum(int(math.floor(v * 1e6 + 0.5)) for v in vals)
        return float(qs) / len(vals) / 1e6

    for lab in (0, 1):
        rvecs = [v for i, l, v in rows if l == lab and i % 2 == 0]
        cvecs = [v for i, l, v in rows if l == lab and i % 2 == 1]
        mr = [qmean([v[d] for v in rvecs]) for d in range(dim)]
        mc = [qmean([v[d] for v in cvecs]) for d in range(dim)]
        rr, cc, rc = _fold_dot(mr, mr), _fold_dot(mc, mc), _fold_dot(mr, mc)
        cos = rc / (math.sqrt(rr) * math.sqrt(cc))
        shift = math.sqrt(max(rr - 2 * rc + cc, 0.0))
        ratio = math.sqrt(cc) / math.sqrt(rr)
        r = out[lab]
        assert r["n_ref"] == len(rvecs) and r["n_cur"] == len(cvecs)
        assert r["cos_q6"] == math.floor(cos * 1e6 + 0.5)
        assert r["shift_q6"] == math.floor(shift * 1e6 + 0.5)
        assert r["ratio_q6"] == math.floor(ratio * 1e6 + 0.5)


def test_centroid_drift_identical_and_one_sided(spark):
    from adtl_spark.operators.monitor import centroid_drift

    df = spark.createDataFrame(
        [
            (0, 0, [1.0, 2.0]),
            (1, 0, [3.0, -1.0]),
            (2, 1, [0.5, 0.5]),
        ],
        "vec_id long, label long, embedding array<double>",
    )
    # identical snapshots: cos == 1, shift == 0, ratio == 1 exactly
    same = centroid_drift(df, df, label_col="label").collect()
    assert all(
        (r["cos_q6"], r["shift_q6"], r["ratio_q6"]) == (1000000, 0, 1000000)
        for r in same
    )
    # label 1 lives only on the ref side -> omitted (needs both points)
    out = centroid_drift(df, df.filter(F.col("label") == 0), label_col="label")
    assert [r["label"] for r in out.collect()] == [0]
    # global mode (no label): one row
    g = centroid_drift(df, df).collect()
    assert len(g) == 1 and g[0]["label"] == 0


# ------------------------------------------------------ hard negatives --
def test_hard_negatives_label_filter_and_ranking(spark):
    from adtl_spark.operators.similarity import hard_negatives

    rows = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [0.9, 0.1, 0.0]),   # same label as q0: must be excluded
        (2, 1, [0.95, 0.05, 0.0]),  # different label, very similar: hardest
        (3, 1, [0.0, 1.0, 0.0]),
        (4, 2, [0.5, 0.5, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    got = hard_negatives(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    labels = {i: l for i, l, _ in rows}
    assert all(labels[r["corpus_id"]] != 0 for r in got)
    ranked = [r["corpus_id"] for r in sorted(got, key=lambda r: r["rank"])]
    # python cosine ordering among different-label candidates
    def cos(a, b):
        return _fold_dot(a, b) / (
            math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
        )

    vecs = {i: v for i, _, v in rows}
    want = sorted(
        (i for i in vecs if i != 0 and labels[i] != 0),
        key=lambda i: (-cos(vecs[0], vecs[i]), i),
    )
    assert ranked == want[:3]
    # all-same-label corpus: nothing to mine, empty result
    mono = df.withColumn("label", F.lit(7))
    assert hard_negatives(mono, mono.limit(1), k=3).count() == 0


# ------------------------------------------------- join cardinality --
def test_join_cardinality_matches_python(spark):
    from adtl_spark.operators.profile import join_cardinality

    left = [(1,), (1,), (2,), (3,), (3,), (3,), (None,)]
    right = [(1,), (2,), (2,), (2,), (4,), (None,), (None,)]
    ldf = spark.createDataFrame(left, "k int")
    rdf = spark.createDataFrame(right, "k int")
    r = join_cardinality(ldf, rdf, "k", top_k=1).collect()[0]
    # exact mirrors of SQL inner-join semantics (nulls never match but
    # DO count as distinct keys on their own side, like GROUP BY)
    assert r["n_left"] == 7 and r["n_right"] == 7
    assert r["keys_left"] == 4 and r["keys_right"] == 4
    assert r["shared_keys"] == 2           # keys 1 and 2
    assert r["join_rows"] == 2 * 1 + 1 * 3  # = 5
    assert r["max_key_pairs"] == 3
    assert r["topk_share_q6"] == math.floor(3 / 5 * 1e6 + 0.5)
    # sanity: join_rows equals the materialized inner join's count
    assert ldf.join(rdf, "k").count() == 5


def test_join_cardinality_disjoint_and_empty(spark):
    from adtl_spark.operators.profile import join_cardinality

    a = spark.createDataFrame([(1,), (2,)], "k int")
    b = spark.createDataFrame([(3,), (4,)], "k int")
    r = join_cardinality(a, b, "k").collect()[0]
    assert (r["shared_keys"], r["join_rows"], r["topk_share_q6"]) == (0, 0, 0)
    empty = a.filter(F.lit(False))
    r = join_cardinality(a, empty, "k").collect()[0]
    assert (r["n_right"], r["keys_right"], r["join_rows"]) == (0, 0, 0)


# --------------------------------------------------- phrase search --
def test_phrase_search_matches_python(spark):
    from adtl_spark.operators.text import phrase_search

    docs = [
        (0, "a b c a b c a b"),      # overlapping bigram matches
        (1, "x a b y a a b"),
        (2, "b a"),                   # reversed: no match
        (3, "A B"),                   # tokenizer lowercases
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["match_pos"])
        for r in phrase_search(df, ["a", "b"]).collect()
    )
    want = []
    for i, t in docs:
        toks = t.lower().split()
        for p in range(len(toks) - 1):
            if toks[p : p + 2] == ["a", "b"]:
                want.append((i, p))
    assert got == sorted(want)


def test_phrase_search_repeated_token_phrase(spark):
    # phrase with a repeated token: the distinct-idx check must demand a
    # TRUE alignment, not just both tokens nearby
    from adtl_spark.operators.text import phrase_search

    df = spark.createDataFrame(
        [
            (0, "a x a a x a"),   # matches at 0 and 3
            (1, "a x x a"),       # 'a x' then 'x a' — no 'a x a'
            (2, "a a a"),          # no x at all
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["match_pos"])
        for r in phrase_search(df, ["a", "x", "a"]).collect()
    )
    assert got == [(0, 0), (0, 3)]


def test_phrase_search_single_token_and_empty(spark):
    import pytest as _pytest

    from adtl_spark.operators.text import phrase_search

    df = spark.createDataFrame(
        [(0, "w q w"), (1, "q")], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["match_pos"])
        for r in phrase_search(df, ["w"]).collect()
    )
    assert got == [(0, 0), (0, 2)]
    with _pytest.raises(ValueError):
        phrase_search(df, [])


# -------------------------------------------------- robust outliers --
def test_robust_outliers_matches_python(spark):
    from adtl_spark.operators.profile import robust_outliers

    vals = [10, 11, 12, 10, 11, 12, 10, 11, 50, 9, 13, 300]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, x long"
    )
    got = {
        r["id"]: (r["value"], r["dev"], r["med"], r["mad"])
        for r in robust_outliers(df, "x", "id").collect()
    }
    s = sorted(vals)
    n = len(vals)
    med = s[(n - 1) // 2]  # lower median == smallest x with 2*cum >= n
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(n - 1) // 2]
    want = {
        i: (v, abs(v - med), med, mad)
        for i, v in enumerate(vals)
        if 6745 * abs(v - med) > 35000 * mad
    }
    assert got == want and len(want) == 2  # 50 and 300


def test_robust_outliers_zero_mad_and_guard(spark):
    import pytest as _pytest

    from adtl_spark.operators.profile import robust_outliers

    # majority constant -> MAD 0 -> every deviating row flags (loud)
    vals = [5, 5, 5, 5, 5, 7, 4]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, x long"
    )
    rows = robust_outliers(df, "x", "id").collect()
    assert {r["id"] for r in rows} == {5, 6}
    assert all(r["mad"] == 0 for r in rows)
    # max_points guard fails loudly on an unexpectedly wide domain
    wide = spark.range(0, 500).select(F.col("id"), F.col("id").alias("x"))
    with _pytest.raises(ValueError):
        robust_outliers(wide, "x", "id", max_points=100)


# ----------------------------------------------- bloom-filtered join --
def test_bloom_filtered_join_equals_plain_join(spark):
    from adtl_spark.operators.joins import bloom_filtered_join

    probe = spark.createDataFrame(
        [(i % 37, i) for i in range(500)], "k long, payload long"
    )
    build = spark.createDataFrame(
        [(j, j * 100) for j in range(0, 37, 3)], "bk long, battr long"
    )
    got = sorted(
        (r["k"], r["payload"], r["bk"], r["battr"])
        for r in bloom_filtered_join(probe, build, "k", "bk").collect()
    )
    want = sorted(
        (r["k"], r["payload"], r["bk"], r["battr"])
        for r in probe.join(build, F.col("k") == F.col("bk")).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_prefilter_actually_prunes(spark):
    # the scale claim: the bloom pass must drop (most of) the rows whose
    # keys are absent from the build side BEFORE the real join
    from adtl_spark.operators.corpus import (
        BLOOM_BITS_PER_WORD,
        _BLOOM_SEED,
        _bloom_pos_sql,
    )
    from adtl_spark.operators.dedup import minhash_coefficients

    words = 8192
    (a1, b1), (a2, b2) = minhash_coefficients(2, _BLOOM_SEED)
    build_keys = set(range(0, 1000, 50))  # 20 keys
    probe_keys = list(range(1000))

    def bloom_bits():
        bits = {}
        for kk in build_keys:
            for a, b in ((a1, b1), (a2, b2)):
                p = (((kk % 2147483647) * a + b) % 2147483647) % (
                    words * BLOOM_BITS_PER_WORD
                )
                bits.setdefault(p // BLOOM_BITS_PER_WORD, set()).add(
                    p % BLOOM_BITS_PER_WORD
                )
        return bits

    bits = bloom_bits()
    survivors = 0
    for kk in probe_keys:
        ok = True
        for a, b in ((a1, b1), (a2, b2)):
            p = (((kk % 2147483647) * a + b) % 2147483647) % (
                words * BLOOM_BITS_PER_WORD
            )
            if p % BLOOM_BITS_PER_WORD not in bits.get(
                p // BLOOM_BITS_PER_WORD, set()
            ):
                ok = False
                break
        if ok:
            survivors += 1
    # with 20 keys in a 516k-bit filter the false-positive rate is ~0:
    # essentially only the 20 true keys survive the python replay
    assert survivors < 40


def test_ann_ivfpq_rerank_matches_python(spark):
    from adtl_spark.operators.similarity import ann_ivfpq_rerank

    dim, m, ks, n_centroids, n_probe, k, shortlist = 8, 2, 4, 4, 2, 3, 6
    vecs = {
        i: [math.sin(i * 11 + d * 5) * 2 for d in range(dim)]
        for i in range(14)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r["query_id"], r["rank"], r["corpus_id"], r["qdist"])
        for r in ann_ivfpq_rerank(
            df, df.limit(2), n_centroids=n_centroids, n_probe=n_probe,
            m=m, ks=ks, k=k, shortlist=shortlist, dim=dim,
        ).collect()
    )
    short = _py_ivfpq(vecs, n_centroids, n_probe, m, ks, shortlist, dim)
    want = []
    for qid in (0, 1):
        qv = vecs[qid]
        rr = []
        for _, cid in short[qid]:
            cv = vecs[cid]
            d2 = (
                _fold_dot(qv, qv) - 2 * _fold_dot(qv, cv) + _fold_dot(cv, cv)
            )
            rr.append((int(math.floor(d2 * 1000000000 + 0.5)), cid))
        for rank, (d, cid) in enumerate(sorted(rr)[:k], start=1):
            want.append((qid, rank, cid, d))
    assert got == sorted(want)


# ----------------------------------------------- bitmap distinct rollup --
def test_bitmap_distinct_rollup_exact(spark):
    from adtl_spark.operators.sketches import bitmap_distinct_rollup

    rows = [
        ("a", 0), ("a", 1), ("a", 1), ("a", 200),
        ("b", 1), ("b", 63), ("b", 64), ("b", 200), ("b", 200),
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {
        r["grp"]: (r["n_words"], r["n_distinct"])
        for r in bitmap_distinct_rollup(df, "k", "g").collect()
    }
    # exact per group and exact merged total (distinct of the union)
    assert out["a"][1] == 3 and out["b"][1] == 4
    assert out["__all__"][1] == len({k for _, k in rows})  # == 6
    # word counts: a touches words {0, 3}; b touches {0, 1, 3}; merged 3
    assert out["a"][0] == 2 and out["b"][0] == 3 and out["__all__"][0] == 3
    # cross-check against Spark's own countDistinct
    want = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(
            F.countDistinct("k").alias("d")
        ).collect()
    }
    for g, d in want.items():
        assert out[g][1] == d


def test_bitmap_distinct_rollup_boundary_bits(spark):
    # keys on word boundaries (0, 62, 63, 125, 126) land in the right
    # words/bits — the off-by-one trap of the 63-bit packing
    from adtl_spark.operators.sketches import bitmap_distinct_rollup

    df = spark.createDataFrame(
        [("x", k) for k in (0, 62, 63, 125, 126, 126)], "g string, k long"
    )
    out = {
        r["grp"]: (r["n_words"], r["n_distinct"])
        for r in bitmap_distinct_rollup(df, "k", "g").collect()
    }
    assert out["x"] == (3, 5) and out["__all__"] == (3, 5)


def test_hard_negatives_ann_candidates_and_ranking(spark):
    # indexed miner: every result lies in the query's probed cells AND
    # has a different label; ranking is exact cosine within candidates
    from adtl_spark.operators.similarity import (
        _centroid_literals,
        hard_negatives_ann,
    )

    dim = 4
    rows = [
        (i, i % 3, [math.cos(i * 3 + d) * 2 for d in range(dim)])
        for i in range(18)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    n_centroids, n_probe = 4, 2
    got = hard_negatives_ann(
        df, df.limit(2), n_centroids=n_centroids, n_probe=n_probe, k=18
    ).collect()
    cents = _centroid_literals(df, n_centroids, "vec_id", "embedding")
    vecs = {i: v for i, _, v in rows}
    labels = {i: l for i, l, _ in rows}

    def cell_rank(v):
        return [
            cid
            for _, cid in sorted(
                (-(_fold_dot(v, cv)) / nrm, cid) for cid, cv, nrm in cents
            )
        ]

    cells = {i: cell_rank(v)[0] for i, v in vecs.items()}
    for qid in (0, 1):
        probed = set(cell_rank(vecs[qid])[:n_probe])
        mine = [r for r in got if r["query_id"] == qid]
        assert mine, "probed cells must yield candidates on this corpus"
        for r in mine:
            cid = r["corpus_id"]
            assert cells[cid] in probed
            assert labels[cid] != labels[qid] and cid != qid
        # ranking equals exact cosine order over the candidate set
        def cos(a, b):
            return _fold_dot(a, b) / (
                math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
            )

        want = sorted(
            (
                i
                for i in vecs
                if i != qid and labels[i] != labels[qid] and cells[i] in probed
            ),
            key=lambda i: (-cos(vecs[qid], vecs[i]), i),
        )
        assert [r["corpus_id"] for r in sorted(mine, key=lambda r: r["rank"])] == want


# ----------------------------------------- degenerate-input contracts --
def test_ann_ivfpq_corpus_smaller_than_codebook(spark):
    # corpus smaller than ks and n_centroids: codebooks/centroids just
    # shrink to the available vectors — no crash, results still exact
    from adtl_spark.operators.similarity import ann_ivfpq

    dim = 4
    vecs = {i: [float(i + d) for d in range(dim)] for i in range(3)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = ann_ivfpq(
        df, df, n_centroids=8, n_probe=8, m=2, ks=8, k=5, dim=dim
    ).collect()
    want = _py_ivfpq(vecs, 8, 8, 2, 8, 5, dim)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["qdist"], r["corpus_id"]))
    assert {q: sorted(v) for q, v in by_q.items()} == {
        q: sorted(v) for q, v in want.items() if v
    }


def test_centroid_drift_randomized_differential(spark):
    import random

    from adtl_spark.operators.monitor import centroid_drift

    rng = random.Random(417)
    dim = 6
    rows = [
        (i, rng.randrange(3), [rng.uniform(-2, 2) for _ in range(dim)])
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    ref = df.filter(F.col("vec_id") % 2 == 0)
    cur = df.filter(F.col("vec_id") % 2 == 1)
    out = {
        r["label"]: r
        for r in centroid_drift(ref, cur, label_col="label").collect()
    }

    def qmean(vals):
        qs = sum(int(math.floor(v * 1e6 + 0.5)) for v in vals)
        return float(qs) / len(vals) / 1e6

    for lab in sorted({l for _, l, _ in rows}):
        rv = [v for i, l, v in rows if l == lab and i % 2 == 0]
        cv = [v for i, l, v in rows if l == lab and i % 2 == 1]
        if not rv or not cv:
            assert lab not in out
            continue
        mr = [qmean([v[d] for v in rv]) for d in range(dim)]
        mc = [qmean([v[d] for v in cv]) for d in range(dim)]
        rr, cc, rc = _fold_dot(mr, mr), _fold_dot(mc, mc), _fold_dot(mr, mc)
        assert out[lab]["cos_q6"] == math.floor(
            rc / (math.sqrt(rr) * math.sqrt(cc)) * 1e6 + 0.5
        )
        assert out[lab]["shift_q6"] == math.floor(
            math.sqrt(max(rr - 2 * rc + cc, 0.0)) * 1e6 + 0.5
        )


def test_chi2_drift_randomized_differential(spark):
    import random

    from adtl_spark.operators.monitor import chi2_drift

    rng = random.Random(99)
    cats = "abcdef"
    ref_vals = [rng.choice(cats) for _ in range(200)]
    cur_vals = [rng.choice(cats[:4]) for _ in range(150)]
    ref = spark.createDataFrame([(v,) for v in ref_vals], ["s"])
    cur = spark.createDataFrame([(v,) for v in cur_vals], ["s"])
    out = {r["category"]: r for r in chi2_drift(ref, cur, F.col("s")).collect()}
    grand = len(ref_vals) + len(cur_vals)
    total_chi2 = 0
    for cat in sorted(set(ref_vals) | set(cur_vals)):
        n_r, n_c = ref_vals.count(cat), cur_vals.count(cat)
        e_r = (n_r + n_c) * len(ref_vals) / grand
        e_c = (n_r + n_c) * len(cur_vals) / grand
        chi2 = (n_r - e_r) ** 2 / e_r + (n_c - e_c) ** 2 / e_c
        assert out[cat]["chi2_q6"] == math.floor(chi2 * 1e6 + 0.5)
        total_chi2 += out[cat]["chi2_q6"]
    # the headline statistic is clearly nonzero for disjoint tails
    assert total_chi2 > 1000000


def test_bitmap_rollup_or_merge_additivity(spark):
    # the merge law the rollup relies on: bitmaps built per PARTITION of
    # the data OR-merge to the same distinct counts as one-shot build —
    # what makes per-shard bitmap state reusable without rescanning
    from adtl_spark.operators.sketches import bitmap_distinct_rollup

    rows = [("g%d" % (i % 2), (i * 7) % 150) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, k long")
    whole = {
        r["grp"]: r["n_distinct"]
        for r in bitmap_distinct_rollup(df, "k", "g").collect()
    }
    half_a = df.filter(F.col("k") % 2 == 0)
    half_b = df.filter(F.col("k") % 2 == 1)
    # rebuild from the two halves' bitmap tables by OR at (grp, word)
    from pyspark.sql import functions as SF

    def bitmaps(d):
        return (
            d.select(
                "g",
                SF.expr("k DIV 63").alias("word"),
                SF.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(k % 63 AS INT))"
                ).alias("mask"),
            )
            .groupBy("g", "word")
            .agg(SF.bit_or("mask").alias("bits"))
        )

    merged = (
        bitmaps(half_a)
        .unionByName(bitmaps(half_b))
        .groupBy("g", "word")
        .agg(SF.bit_or("bits").alias("bits"))
        .groupBy("g")
        .agg(SF.sum(SF.expr("bit_count(bits)")).alias("d"))
    )
    got = {r["g"]: r["d"] for r in merged.collect()}
    assert got == {g: n for g, n in whole.items() if g != "__all__"}


# ------------------------------------------- persisted IVF-PQ index --
def test_ivfpq_persisted_index_equals_in_memory_and_prunes(spark, tmp_path):
    from adtl_spark.operators.similarity import (
        ann_ivfpq,
        ann_ivfpq_query_index,
        write_ivfpq_index,
    )

    dim, m, ks, n_centroids, n_probe, k = 8, 2, 4, 4, 2, 3
    vecs = {
        i: [math.sin(i * 7 + d * 3) * 2 for d in range(dim)] for i in range(12)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(
        df, path, n_centroids=n_centroids, m=m, ks=ks, dim=dim
    )
    queries = df.limit(3)
    via_index = ann_ivfpq_query_index(
        spark, path, queries, n_probe=n_probe, k=k
    )
    in_memory = ann_ivfpq(
        df, queries, n_centroids=n_centroids, n_probe=n_probe,
        m=m, ks=ks, k=k, dim=dim,
    )
    key = lambda r: (r["query_id"], r["rank"], r["corpus_id"], r["qdist"])
    assert sorted(map(key, via_index.collect())) == sorted(
        map(key, in_memory.collect())
    )
    # the scale claim: the probed-cell IN-list must reach the parquet
    # scan as a PartitionFilter so unprobed cells are never read
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan[:2000]


def test_ivfpq_index_append_absorbs_new_vectors(spark, tmp_path):
    # maintenance path: append encodes with the PERSISTED model (no
    # retrain), so query results equal an in-memory index built with the
    # ORIGINAL corpus's centroids/codebooks over the full union
    from adtl_spark.operators.similarity import (
        _centroid_literals,
        _ivfpq_score_codes,
        _pq_codebooks,
        ann_ivfpq_query_index,
        append_to_ivfpq_index,
        write_ivfpq_index,
    )

    dim, m, ks, n_centroids, n_probe, k = 8, 2, 4, 4, 2, 4
    base_vecs = {
        i: [math.sin(i * 7 + d * 3) * 2 for d in range(dim)] for i in range(10)
    }
    new_vecs = {
        i: [math.cos(i * 5 + d) * 2 for d in range(dim)] for i in range(100, 106)
    }
    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(list(base_vecs.items()), schema)
    new = spark.createDataFrame(list(new_vecs.items()), schema)
    path = str(tmp_path / "idx")
    write_ivfpq_index(base, path, n_centroids=n_centroids, m=m, ks=ks, dim=dim)
    append_to_ivfpq_index(new, path)

    queries = base.limit(2)
    got = ann_ivfpq_query_index(spark, path, queries, n_probe=n_probe, k=k)

    # reference: score the union's codes built with the BASE model
    cents = _centroid_literals(base, n_centroids, "vec_id", "embedding")
    books = _pq_codebooks(base, m, ks, dim, "vec_id", "embedding")
    from adtl_spark.operators.similarity import _cell_rank_sql, _pq_cell_sql
    from pyspark.sql import functions as SF

    union = base.unionByName(new)
    ranked = _cell_rank_sql("embedding", cents)
    d_sub = dim // m
    codes = union.select(
        SF.col("vec_id").alias("corpus_id"),
        SF.expr(f"element_at({ranked}, 1).cid").alias("cell"),
        *[
            SF.slice(SF.col("embedding"), j * d_sub + 1, d_sub).alias(f"sv{j}")
            for j in range(m)
        ],
    ).select(
        "corpus_id",
        "cell",
        *[
            SF.expr(_pq_cell_sql(f"sv{j}", books[j], d_sub)).alias(f"code{j}")
            for j in range(m)
        ],
    )
    want = _ivfpq_score_codes(
        codes, queries, cents, books, n_probe, k, dim, "vec_id", "embedding"
    )
    key = lambda r: (r["query_id"], r["rank"], r["corpus_id"], r["qdist"])
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    # appended ids are findable (at least one new vector in some result)
    assert any(r["corpus_id"] >= 100 for r in got.collect())


# ------------------------------------------------- join advisor smoke --
def test_join_advisor_smoke(spark):
    # the tool composes the oracle-gated profiling operators; pin that
    # its recommendation logic runs and prices the join exactly
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "tools/join_advisor.py",
            "/root/testdata/sf0.001",
            "lineitem",
            "l_orderkey",
            "orders",
            "o_orderkey",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "exact join output:" in out.stdout
    assert "->" in out.stdout  # at least one recommendation line


# ------------------------------------------------- residual IVFADC --
def _py_ivfpq_residual(vecs, n_centroids, n_probe, m, ks, k, dim):
    "Straight-line replay of similarity.ann_ivfpq_residual's conventions."
    d_sub = dim // m
    ids = sorted(vecs)
    cents = []
    for cid in ids[:n_centroids]:
        v = vecs[cid]
        cents.append((cid, v, _fold_dot(v, v) ** 0.5))
    cent_by_id = {cid: cv for cid, cv, _ in cents}

    def cell_of(v):
        return sorted(
            (-(_fold_dot(v, cv)) / nrm, cid) for cid, cv, nrm in cents
        )[0][1]

    seed_res = []
    for i in ids[:ks]:
        v = vecs[i]
        c = cent_by_id[cell_of(v)]
        seed_res.append([x - y for x, y in zip(v, c)])
    books = [
        [(code, rv[j * d_sub : (j + 1) * d_sub]) for code, rv in enumerate(seed_res)]
        for j in range(m)
    ]
    cells = {i: cell_of(v) for i, v in vecs.items()}

    def codes_of(i):
        rv = [x - y for x, y in zip(vecs[i], cent_by_id[cells[i]])]
        out = []
        for j in range(m):
            sv = rv[j * d_sub : (j + 1) * d_sub]
            scored = sorted(
                (0.5 * _fold_dot(cv, cv) - _fold_dot(sv, cv), code)
                for code, cv in books[j]
            )
            out.append(scored[0][1])
        return out

    codes = {i: codes_of(i) for i in vecs}
    results = {}
    for qid, qv in vecs.items():
        probed = [
            cid
            for _, cid in sorted(
                (-(_fold_dot(qv, cv)) / nrm, cid) for cid, cv, nrm in cents
            )[:n_probe]
        ]
        cand = []
        for cid, v in vecs.items():
            if cid == qid or cells[cid] not in probed:
                continue
            qr = [x - y for x, y in zip(qv, cent_by_id[cells[cid]])]
            qdist = 0
            for j in range(m):
                sq = qr[j * d_sub : (j + 1) * d_sub]
                cb = books[j][codes[cid][j]][1]
                d = (
                    _fold_dot(sq, sq)
                    - 2 * _fold_dot(sq, cb)
                    + 2.0 * (0.5 * _fold_dot(cb, cb))
                )
                qdist += int(math.floor(d * 1000000000 + 0.5))
            cand.append((qdist, cid))
        results[qid] = sorted(cand)[:k]
    return results


def test_ann_ivfpq_residual_matches_python(spark):
    from adtl_spark.operators.similarity import ann_ivfpq_residual

    dim, m, ks, n_centroids, n_probe, k = 8, 2, 4, 4, 2, 3
    vecs = {
        i: [math.sin(i * 13 + d * 5) * 2 for d in range(dim)] for i in range(12)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = ann_ivfpq_residual(
        df, df, n_centroids=n_centroids, n_probe=n_probe, m=m, ks=ks, k=k,
        dim=dim,
    ).collect()
    want = _py_ivfpq_residual(vecs, n_centroids, n_probe, m, ks, k, dim)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["qdist"], r["corpus_id"])
        )
    for qid, pairs in want.items():
        rows = sorted(by_q.get(qid, []))
        assert [(i + 1, d, c) for i, (d, c) in enumerate(pairs)] == rows


# --------------------------------------------- persisted postings index --
def test_phrase_search_index_equals_in_memory_and_prunes(spark, tmp_path):
    from adtl_spark.operators.text import (
        phrase_search,
        phrase_search_index,
        write_postings_index,
    )

    docs = [
        (0, "a b c a b c a b"),
        (1, "x a b y a a b"),
        (2, "b a"),
        (3, "A B"),
        (4, "zz yy xx ww"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "postings")
    write_postings_index(df, path, n_buckets=16)

    for phrase in (["a", "b"], ["a", "x", "a"], ["zz"]):
        got = sorted(
            (r["doc_id"], r["match_pos"])
            for r in phrase_search_index(spark, path, phrase, n_buckets=16).collect()
        )
        want = sorted(
            (r["doc_id"], r["match_pos"])
            for r in phrase_search(df, phrase).collect()
        )
        assert got == want

    # the scale claims: bucket pruning reaches the scan as a
    # PartitionFilter AND the token equality is pushed into the scan
    q = phrase_search_index(spark, path, ["a", "b"], n_buckets=16)
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "bucket" in pf.group(1), plan[:1500]
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "token" in pushed.group(1), plan[:1500]

"""Round-9 operator units: query-likelihood retrieval, reciprocal-rank
fusion, nDCG/MRR ranked evaluation, MMR diversification, label
propagation, and the DoReMi mixture step.  Each operator's oracle twin
is exercised by the registry gate (tools/check_oracle.py); these tests
pin the SEMANTICS against straight-line Python replays on small inputs,
plus the edge cases the gate corpus never hits (all-OOV queries,
single-list fusion, disjoint rankings, k > pool, isolated vertices,
single-domain corpora)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from adtl_spark.operators import retrieval as R
from adtl_spark.operators.graph import cooccurrence_edges, label_propagation
from adtl_spark.operators.sampling import doremi_step

DOCS = [
    (1, "spark joins the hash table with spark speed", "a"),
    (2, "columnar scan and filter over parquet", "a"),
    (3, "hash join beats sort merge join on small tables", "b"),
    (4, "the quick brown fox", "b"),
    (5, "spark spark spark scan scan filter", "c"),
]
QUERIES = [(1, "spark hash join"), (2, "columnar filter")]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def _q_df(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query string")


# ---------------------------------------------------------------- QL ----
def _py_ql(docs, queries, k=5, mu=2000):
    """Straight-line replay of retrieval.ql_topk's scoring protocol."""
    toks = {d: t.lower().split() for d, t, *_ in docs}
    tf: dict[tuple[int, str], int] = {}
    ctf: dict[str, int] = {}
    for d, ts in toks.items():
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
            ctf[t] = ctf.get(t, 0) + 1
    total = sum(ctf.values())
    out = []
    for qid, q in queries:
        qtf: dict[str, int] = {}
        for t in q.lower().split():
            if t in ctf:
                qtf[t] = qtf.get(t, 0) + 1
        qlen = sum(qtf.values())
        scores = {}
        for (d, t), f in tf.items():
            if t in qtf:
                a = math.floor(
                    math.log(1.0 + (f * total) / (mu * ctf[t])) * 1e6 + 0.5
                )
                scores[d] = scores.get(d, 0) + qtf[t] * a
        for d in scores:
            dl = len(toks[d])
            b = math.floor(math.log(mu / (dl + mu)) * 1e6 + 0.5)
            scores[d] += qlen * b
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rank, (d, s) in enumerate(ranked, start=1):
            out.append((qid, d, rank, s / 1e6))
    return out


def test_ql_topk_matches_python_replay(spark):
    got = sorted(
        tuple(r)
        for r in R.ql_topk(_docs_df(spark), _q_df(spark), k=5).collect()
    )
    assert got == sorted(_py_ql(DOCS, QUERIES, k=5))


def test_ql_topk_all_oov_query_emits_nothing(spark):
    qdf = spark.createDataFrame(
        [(9, "zzz qqq")], "query_id long, query string"
    )
    assert R.ql_topk(_docs_df(spark), qdf, k=5).count() == 0


# --------------------------------------------------------------- RRF ----
def test_rrf_fuse_exact_contributions_and_single_list_docs(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, doc_id long, rank long"
    )
    rows = {
        r["doc_id"]: (r["rank"], r["rrf"])
        for r in R.rrf_fuse_topk(a, b, k=10).collect()
    }
    c = lambda r: 10**12 // (60 + r)  # noqa: E731
    # doc 11: rank 2 in a + rank 1 in b -> top; 10 and 12 one-list only
    assert rows[11] == (1, (c(2) + c(1)) / 1e12)
    assert rows[10] == (2, c(1) / 1e12)  # beats 12 (same score? no:)
    assert rows[12] == (3, c(2) / 1e12)


def test_rrf_tie_breaks_on_lower_doc_id(spark):
    a = spark.createDataFrame(
        [(1, 20, 1), (1, 7, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 7, 1), (1, 20, 2)], "query_id long, doc_id long, rank long"
    )
    got = [
        r["doc_id"]
        for r in R.rrf_fuse_topk(a, b, k=2).orderBy("rank").collect()
    ]
    assert got == [7, 20]  # equal scores -> lower id first


# -------------------------------------------------------------- nDCG ----
def _ranked_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, corpus_id long, rank long"
    )


def test_ndcg_identical_rankings_score_one(spark):
    truth = _ranked_df(spark, [(1, i + 100, i) for i in range(1, 6)])
    out = R.ndcg_vs_truth(truth, truth, k=5).collect()[0]
    assert out["overlap"] == 5
    assert out["ndcg"] == 1.0
    assert out["mrr"] == 1.0


def test_ndcg_disjoint_rankings_score_zero(spark):
    truth = _ranked_df(spark, [(1, i + 100, i) for i in range(1, 6)])
    approx = _ranked_df(spark, [(1, i + 900, i) for i in range(1, 6)])
    out = R.ndcg_vs_truth(truth, approx, k=5).collect()[0]
    assert (out["overlap"], out["ndcg"], out["mrr"]) == (0, 0.0, 0.0)


def test_ndcg_partial_overlap_matches_hand_computation(spark):
    k = 3
    w = R._ndcg_weights(k)  # [1e6, 630930, 500000]
    idcg = 3 * w[0] + 2 * w[1] + 1 * w[2]
    truth = _ranked_df(spark, [(1, 100, 1), (1, 101, 2), (1, 102, 3)])
    # approx puts truth-top1 at position 2, truth-rank2 at position 1
    approx = _ranked_df(spark, [(1, 101, 1), (1, 100, 2), (1, 999, 3)])
    out = R.ndcg_vs_truth(truth, approx, k=k).collect()[0]
    dcg = 2 * w[0] + 3 * w[1]
    assert out["overlap"] == 2
    assert out["ndcg"] == (dcg * 10000 // idcg) / 10000.0
    assert out["mrr"] == (10**6 // 2) / 1e6


# --------------------------------------------------------------- MMR ----
VECS = {
    1: [1.0, 0.0, 0.0, 0.0],
    2: [0.9, 0.1, 0.0, 0.0],
    3: [0.9, 0.05, 0.05, 0.0],
    4: [0.0, 1.0, 0.0, 0.0],
    5: [0.1, 0.9, 0.1, 0.0],
    6: [0.0, 0.0, 1.0, 0.0],
}


def _cos(a, b):
    d = n1 = n2 = 0.0
    for x, y in zip(a, b):
        d += x * y
    for x in a:
        n1 += x * x
    for y in b:
        n2 += y * y
    return d / (math.sqrt(n1) * math.sqrt(n2))


def _py_mmr(vecs, qids, k, pool):
    """Straight-line replay of retrieval.mmr_topk's greedy protocol."""
    out = []
    for q in qids:
        sims = sorted(
            ((_cos(vecs[q], vecs[c]), c) for c in vecs if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:pool]
        # Spark's round(cos, 4) == HALF_UP on the shortest decimal repr
        from decimal import ROUND_HALF_UP, Decimal

        def r4(x):
            return float(
                Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
            )

        rel = {c: int(math.floor(r4(s) * 10000 + 0.5)) * 100 for s, c in sims}
        simq = {
            (a, b): int(math.floor(_cos(vecs[a], vecs[b]) * 1e6 + 0.5))
            for a in rel
            for b in rel
            if a != b
        }
        sel = []
        first = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        sel.append((first[0], 1, 7 * first[1]))
        while len(sel) < min(k, len(rel)):
            best = None
            for c in rel:
                if any(c == s[0] for s in sel):
                    continue
                ms = max(simq[(c, s[0])] for s in sel)
                score = 7 * rel[c] - 3 * ms
                if best is None or (-score, c) < (-best[1], best[0]):
                    best = (c, score)
            sel.append((best[0], len(sel) + 1, best[1]))
        for cid, pick, mmrq in sel:
            out.append((q, cid, pick, mmrq / 1e7))
    return sorted(out)


def test_mmr_matches_python_replay(spark):
    emb = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") == 1)
    got = sorted(
        tuple(r) for r in R.mmr_topk(emb, queries, k=3, pool=4).collect()
    )
    assert got == _py_mmr(VECS, [1], k=3, pool=4)


def test_mmr_k_beyond_pool_degrades_gracefully(spark):
    emb = spark.createDataFrame(
        [(i, v) for i, v in VECS.items()],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") == 1)
    rows = R.mmr_topk(emb, queries, k=10, pool=3).collect()
    assert len(rows) == 3  # pool exhausted; loop emits nothing further
    assert sorted(r["pick"] for r in rows) == [1, 2, 3]


# --------------------------------------------------------------- LPA ----
def _py_lpa(edges, verts, iters):
    """Synchronous weighted label propagation with the +1 incumbency
    vote, argmax tie -> min label."""
    w: dict[tuple[int, int], int] = {}
    for s, d, wt in edges:
        w[(s, d)] = w.get((s, d), 0) + wt
    lab = {v: v for v in verts}
    for _ in range(iters):
        new = {}
        for v in verts:
            scores: dict[int, int] = {lab[v]: 1}
            for (s, d), wt in w.items():
                if d == v:
                    scores[lab[s]] = scores.get(lab[s], 0) + wt
            new[v] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[
                0
            ][0]
        lab = new
    return lab


def test_label_propagation_two_cliques_and_isolated_vertex(spark):
    # groups {1,2,3} x2 orders, {4,5} x1 order; vertex 9 isolated
    pairs = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2), (11, 3), (12, 4), (12, 5)],
        "g long, m long",
    )
    verts = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 4, 5, 9]], "v long"
    )
    edges = cooccurrence_edges(pairs, "g", "m")
    got = {
        r["v"]: r["community"]
        for r in label_propagation(edges, verts, iters=4).collect()
    }
    e = [
        (r["src"], r["dst"], r["w"])
        for r in edges.collect()
    ]
    assert got == _py_lpa(e, [1, 2, 3, 4, 5, 9], 4)
    assert got[9] == 9  # isolated keeps its own label
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5]
    assert got[1] != got[4]


# ------------------------------------------------------------- DoReMi ---
def _py_doremi(docs, eta=1.0, vocab_k=20):
    toks_all = []
    per_doc = {}
    for d, t, src in docs:
        ts = t.lower().split()
        per_doc[d] = (ts, src)
        toks_all.extend(ts)
    cnt: dict[str, int] = {}
    for t in toks_all:
        cnt[t] = cnt.get(t, 0) + 1
    vocab = dict(
        sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    )
    total = len(toks_all)
    dom: dict[str, list[int]] = {}
    for d, (ts, src) in per_doc.items():
        n = len(ts)
        qsum = sum(
            math.floor(math.log(vocab.get(t, 0.5) / total) * 1e4 + 0.5)
            for t in ts
        )
        acc = dom.setdefault(src, [0, 0])
        acc[0] += n
        acc[1] += qsum
    tn = sum(v[0] for v in dom.values())
    tq = sum(v[1] for v in dom.values())
    kd = len(dom)
    nll_c = -(tq / tn) / 1e4
    stage = {}
    for src, (n, qs) in dom.items():
        nll = -(qs / n) / 1e4
        exc = max(0.0, nll - nll_c)
        eq = int(math.floor(math.exp(eta * exc) * 1e6 + 0.5))
        stage[src] = (n, math.floor(nll * 1e4 + 0.5) / 1e4,
                      math.floor(exc * 1e4 + 0.5) / 1e4, eq)
    es = sum(v[3] for v in stage.values())
    out = {}
    for src, (n, nll, exc, eq) in stage.items():
        wq = (9 * ((eq * 10**6) // es)) // 10 + (10**6 // (10 * kd))
        out[src] = (n, nll, exc, wq / 1e6)
    return out


def test_doremi_step_matches_python_replay(spark):
    got = {
        r["domain"]: (r["n_tokens"], r["nll"], r["excess"], r["weight"])
        for r in doremi_step(_docs_df(spark)).collect()
    }
    assert got == _py_doremi(DOCS)


def test_doremi_single_domain_gets_full_weight(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "only"), (2, "a a d", "only")],
        "doc_id long, text string, source string",
    )
    rows = doremi_step(docs).collect()
    assert len(rows) == 1
    # excess clips to 0, exp factor 1e6, normalized 1e6 -> 0.9 + 0.1
    assert rows[0]["excess"] == 0.0
    assert rows[0]["weight"] == 1.0


def test_doremi_weights_sum_to_one_within_quantum(spark):
    rows = doremi_step(_docs_df(spark)).collect()
    s = sum(r["weight"] for r in rows)
    assert 1.0 - len(rows) * 3e-6 <= s <= 1.0 + 1e-9


# ------------------------------------------------------ RM3 expansion ---
def _py_rm3(docs, queries, m, e, mu=2000):
    fb = {}
    for qid, d, rank, _ in _py_ql(docs, queries, k=m, mu=mu):
        fb.setdefault(qid, []).append(d)
    toks = {d: t.lower().split() for d, t, *_ in docs}
    out = []
    for qid, q in queries:
        qset = set(q.lower().split())
        mass: dict[str, int] = {}
        for d in fb.get(qid, []):
            dl = len(toks[d])
            tf: dict[str, int] = {}
            for t in toks[d]:
                tf[t] = tf.get(t, 0) + 1
            for t, f in tf.items():
                mass[t] = mass.get(t, 0) + (f * 10**6) // dl
        cand = [(t, w) for t, w in mass.items() if t not in qset]
        ranked = sorted(cand, key=lambda kv: (-kv[1], kv[0]))[:e]
        for rank, (t, w) in enumerate(ranked, start=1):
            out.append((qid, t, rank, w / 1e6))
    return sorted(out)


def test_rm3_expansion_matches_python_replay(spark):
    got = sorted(
        tuple(r)
        for r in R.rm3_expansion_terms(
            _docs_df(spark), _q_df(spark), m=3, e=5
        ).collect()
    )
    assert got == _py_rm3(DOCS, QUERIES, m=3, e=5)


def test_rm3_excludes_original_query_terms(spark):
    rows = R.rm3_expansion_terms(
        _docs_df(spark), _q_df(spark), m=3, e=50
    ).collect()
    qterms = {
        (qid, t) for qid, q in QUERIES for t in q.lower().split()
    }
    assert all((r["query_id"], r["term"]) not in qterms for r in rows)


# -------------------------------------------------- hybrid exclude_self --
def test_rrf_exclude_self_drops_query_doc(spark):
    a = spark.createDataFrame(
        [(1, 1, 1), (1, 5, 2)], "query_id long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 5, 1), (1, 6, 2)], "query_id long, doc_id long, rank long"
    )
    got = [
        r["doc_id"]
        for r in R.rrf_fuse_topk(a, b, k=10, exclude_self=True).collect()
    ]
    assert 1 not in got and sorted(got) == [5, 6]


# --------------------------------------------------------- modularity ---
def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _labels_df(spark, rows):
    return spark.createDataFrame(rows, "v long, community long")


def _both_dirs(undirected):
    out = []
    for a, b, w in undirected:
        out.append((a, b, w))
        out.append((b, a, w))
    return out


def test_modularity_two_disjoint_triangles_is_half(spark):
    tri1 = [(1, 2, 1), (2, 3, 1), (1, 3, 1)]
    tri2 = [(4, 5, 1), (5, 6, 1), (4, 6, 1)]
    edges = _edges_df(spark, _both_dirs(tri1 + tri2))
    labels = _labels_df(
        spark, [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)]
    )
    row = __import__("adtl_spark.operators.graph", fromlist=["modularity"]).modularity(
        edges, labels
    ).collect()[0]
    assert row["n_communities"] == 2
    assert row["w_total"] == 12
    assert row["modularity"] == 0.5


def test_modularity_single_community_is_zero_and_edgeless_defined(spark):
    tri = [(1, 2, 1), (2, 3, 1), (1, 3, 1)]
    from adtl_spark.operators.graph import modularity

    edges = _edges_df(spark, _both_dirs(tri))
    labels = _labels_df(spark, [(1, 7), (2, 7), (3, 7)])
    row = modularity(edges, labels).collect()[0]
    assert (row["n_communities"], row["modularity"]) == (1, 0.0)
    empty = _edges_df(spark, [])
    row2 = modularity(empty, labels).collect()[0]
    assert (row2["w_total"], row2["modularity"]) == (0, 0.0)


# ----------------------------------------------------------- TextRank ---
def test_adjacency_edges_counts_and_symmetry(spark):
    from adtl_spark.operators.graph import adjacency_edges

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        (r["src"], r["dst"]): r["w"] for r in adjacency_edges(docs).collect()
    }
    # doc1 bigrams: (a,b), (b,a); doc2: (b,c) -> symmetric counts
    assert got == {
        ("a", "b"): 2,
        ("b", "a"): 2,
        ("b", "c"): 1,
        ("c", "b"): 1,
    }


def test_adjacency_edges_drops_self_pairs_and_short_docs(spark):
    from adtl_spark.operators.graph import adjacency_edges

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    got = {
        (r["src"], r["dst"]): r["w"] for r in adjacency_edges(docs).collect()
    }
    assert got == {("x", "y"): 1, ("y", "x"): 1}  # (x,x) dropped


def test_textrank_star_center_ranks_first(spark):
    from adtl_spark.operators.graph import adjacency_edges, pagerank

    # hub appears adjacent to every spoke; spokes never touch each other
    docs = spark.createDataFrame(
        [(i, f"hub w{i}") for i in range(1, 6)], "doc_id long, text string"
    )
    edges = adjacency_edges(docs)
    verts = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("v")
    ).distinct()
    top = pagerank(edges, verts, iters=3).collect()
    assert top[0]["v"] == "hub"
    assert top[0]["pagerank"] > top[1]["pagerank"]


# ------------------------------------------------ persisted search index
def test_search_index_bm25_and_ql_equal_in_memory_and_prune(spark, tmp_path):
    import re

    from adtl_spark.operators.retrieval import (
        bm25_query_index,
        ql_query_index,
        write_search_index,
    )
    from adtl_spark.operators.text import bm25_topk

    docs = _docs_df(spark)
    qdf = _q_df(spark)
    path = str(tmp_path / "searchidx")
    write_search_index(docs, path, n_buckets=16)

    got_bm = sorted(
        tuple(r)
        for r in bm25_query_index(spark, path, qdf, k=5, n_buckets=16).collect()
    )
    want_bm = sorted(tuple(r) for r in bm25_topk(docs, qdf, k=5).collect())
    assert got_bm == want_bm

    got_ql = sorted(
        tuple(r)
        for r in ql_query_index(spark, path, qdf, k=5, n_buckets=16).collect()
    )
    want_ql = sorted(tuple(r) for r in R.ql_topk(docs, qdf, k=5).collect())
    assert got_ql == want_ql

    # scale claims: bucket pruning reaches the scan as PartitionFilters
    # and the token equality is pushed into the parquet scan
    q = bm25_query_index(spark, path, qdf, k=5, n_buckets=16)
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "bucket" in pf.group(1), plan[:1500]
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "token" in pushed.group(1), plan[:1500]


def test_search_index_all_oov_query_is_empty(spark, tmp_path):
    from adtl_spark.operators.retrieval import (
        bm25_query_index,
        write_search_index,
    )

    path = str(tmp_path / "searchidx2")
    write_search_index(_docs_df(spark), path, n_buckets=16)
    qdf = spark.createDataFrame(
        [(9, "zzz qqq")], "query_id long, query string"
    )
    assert bm25_query_index(spark, path, qdf, k=5, n_buckets=16).count() == 0


def test_append_to_search_index_equals_full_rebuild(spark, tmp_path):
    from adtl_spark.operators.retrieval import (
        append_to_search_index,
        bm25_query_index,
        ql_query_index,
        write_search_index,
    )

    docs = _docs_df(spark)
    qdf = _q_df(spark)
    inc = str(tmp_path / "inc_idx")
    full = str(tmp_path / "full_idx")
    write_search_index(docs.filter(F.col("doc_id") <= 2), inc, n_buckets=16)
    append_to_search_index(
        docs.filter(F.col("doc_id").isin(3, 4)), inc, n_buckets=16
    )
    append_to_search_index(
        docs.filter(F.col("doc_id") == 5), inc, n_buckets=16
    )
    write_search_index(docs, full, n_buckets=16)
    for fn in (bm25_query_index, ql_query_index):
        got = sorted(
            tuple(r) for r in fn(spark, inc, qdf, k=5, n_buckets=16).collect()
        )
        want = sorted(
            tuple(r) for r in fn(spark, full, qdf, k=5, n_buckets=16).collect()
        )
        assert got == want, fn.__name__


# ---------------------------------------------------------------- WARC ---
WARC_SAMPLE = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Record-ID: <urn:uuid:aaa-111>\r\n"
    "WARC-Target-URI: http://example.com/a\r\n"
    "Content-Length: 11\r\n"
    "\r\n"
    "hello world\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: request\r\n"
    "WARC-Record-ID: <urn:uuid:bbb-222>\r\n"
    "WARC-Target-URI: http://example.com/a\r\n"
    "\r\n"
    "GET /a HTTP/1.1\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Record-ID: <urn:uuid:ccc-333>\r\n"
    "WARC-Target-URI: http://example.com/b\r\n"
    "Content-Length: 20\r\n"
    "\r\n"
    "extracted text\nbody\r\n"
)


def test_parse_warc_records_fields_and_content(spark, tmp_path):
    from adtl_spark.sources.io import parse_warc_records, read_text_dir

    d = tmp_path / "warc"
    d.mkdir()
    (d / "f1.warc").write_text(WARC_SAMPLE)
    files = read_text_dir(spark, str(d), whole_files=True)
    rows = {
        r["rec_pos"]: r for r in parse_warc_records(files).collect()
    }
    assert len(rows) == 3
    assert rows[0]["warc_type"] == "response"
    assert rows[0]["target_uri"] == "http://example.com/a"
    assert rows[0]["record_id"] == "urn:uuid:aaa-111"
    assert rows[0]["content_length"] == 11
    assert rows[0]["content"] == "hello world"
    # no Content-Length header -> trailing CRLF padding trimmed
    assert rows[1]["content_length"] is None
    assert rows[1]["content"] == "GET /a HTTP/1.1"
    # multi-line payload cut to content_length exactly
    assert rows[2]["content"] == "extracted text\nbody\r"
    assert rows[2]["content_length"] == 20


def test_wet_documents_keeps_conversion_records_with_stable_ids(
    spark, tmp_path
):
    from adtl_spark.sources.io import read_text_dir, wet_documents

    d = tmp_path / "warc2"
    d.mkdir()
    (d / "f1.warc").write_text(WARC_SAMPLE)
    files = read_text_dir(spark, str(d), whole_files=True)
    docs = wet_documents(files).collect()
    assert len(docs) == 1
    assert docs[0]["uri"] == "http://example.com/b"
    assert docs[0]["text"].startswith("extracted text")
    first_id = docs[0]["doc_id"]
    again = wet_documents(
        read_text_dir(spark, str(d), whole_files=True)
    ).collect()[0]["doc_id"]
    assert first_id == again  # deterministic across reads


# --------------------------------------------------- held-out perplexity
def test_heldout_perplexity_oov_split_scores_at_floor(spark):
    from adtl_spark.operators.corpus import heldout_perplexity

    train = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(3, "z z")], "doc_id long, text string"
    )  # fully OOV
    row = heldout_perplexity(train, ev, vocab_k=10).collect()[0]
    assert row["n_docs"] == 1 and row["n_tokens"] == 2
    assert row["oov_frac"] == 1.0
    # every token scores ln(0.5/6); nll = -ln(0.5/6), quantized at 1e-4
    q = math.floor(math.log(0.5 / 6) * 1e4 + 0.5)
    nll = math.floor(-(2 * q / 2) / 1e4 * 1e4 + 0.5) / 1e4
    assert row["nll"] == nll
    assert row["ppl"] == math.floor(math.exp(-(2 * q / 2) / 1e4) * 1e4 + 0.5) / 1e4


def test_heldout_perplexity_in_vocab_beats_oov(spark):
    from adtl_spark.operators.corpus import heldout_perplexity

    train = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], "doc_id long, text string"
    )
    seen = spark.createDataFrame([(3, "a b")], "doc_id long, text string")
    unseen = spark.createDataFrame([(3, "z z")], "doc_id long, text string")
    p_seen = heldout_perplexity(train, seen).collect()[0]["ppl"]
    p_unseen = heldout_perplexity(train, unseen).collect()[0]["ppl"]
    assert p_seen < p_unseen


# ----------------------------------------------- randomized differentials
def test_randomized_ql_matches_python_replay(spark):
    import random

    rng = random.Random(97)
    words = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 15))), "s")
        for i in range(1, 21)
    ]
    queries = [
        (qid, " ".join(rng.choice(words) for _ in range(rng.randint(1, 4))))
        for qid in (1, 2, 3)
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string, source string")
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    got = sorted(tuple(r) for r in R.ql_topk(ddf, qdf, k=7).collect())
    assert got == sorted(_py_ql(docs, queries, k=7))


def test_randomized_rrf_matches_python_replay(spark):
    import random

    rng = random.Random(23)
    rows_a, rows_b = [], []
    for qid in (1, 2):
        docs = rng.sample(range(100, 140), 12)
        for rank, d in enumerate(docs[:8], start=1):
            rows_a.append((qid, d, rank))
        docs_b = rng.sample(range(100, 140), 12)
        for rank, d in enumerate(docs_b[:8], start=1):
            rows_b.append((qid, d, rank))
    a = spark.createDataFrame(rows_a, "query_id long, doc_id long, rank long")
    b = spark.createDataFrame(rows_b, "query_id long, doc_id long, rank long")
    got = sorted(
        tuple(r) for r in R.rrf_fuse_topk(a, b, k=20).collect()
    )
    # python replay
    scores: dict[tuple[int, int], int] = {}
    for qid, d, rank in rows_a + rows_b:
        scores[(qid, d)] = scores.get((qid, d), 0) + 10**12 // (60 + rank)
    want = []
    for qid in (1, 2):
        ranked = sorted(
            ((d, s) for (q, d), s in scores.items() if q == qid),
            key=lambda kv: (-kv[1], kv[0]),
        )[:20]
        for rank, (d, s) in enumerate(ranked, start=1):
            want.append((qid, d, rank, s / 1e12))
    assert got == sorted(want)


def test_randomized_lpa_matches_python_replay(spark):
    import random

    rng = random.Random(5)
    pairs = []
    for g in range(20):
        members = rng.sample(range(1, 13), rng.randint(2, 4))
        pairs.extend((g, m) for m in members)
    pdf = spark.createDataFrame(pairs, "g long, m long")
    verts = spark.createDataFrame([(v,) for v in range(1, 13)], "v long")
    edges = cooccurrence_edges(pdf, "g", "m")
    e = [(r["src"], r["dst"], r["w"]) for r in edges.collect()]
    got = {
        r["v"]: r["community"]
        for r in label_propagation(edges, verts, iters=3).collect()
    }
    assert got == _py_lpa(e, list(range(1, 13)), 3)


def test_randomized_mmr_matches_python_replay(spark):
    import random

    rng = random.Random(11)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(1, 11)
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id").isin(1, 2))
    got = sorted(
        tuple(r) for r in R.mmr_topk(emb, queries, k=4, pool=6).collect()
    )
    assert got == _py_mmr(vecs, [1, 2], k=4, pool=6)


def test_randomized_doremi_matches_python_replay(spark):
    import random

    rng = random.Random(41)
    words = [f"t{i}" for i in range(9)]
    docs = [
        (
            i,
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 12))),
            rng.choice(["a", "b", "c", "d"]),
        )
        for i in range(1, 31)
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r["domain"]: (r["n_tokens"], r["nll"], r["excess"], r["weight"])
        for r in doremi_step(ddf).collect()
    }
    assert got == _py_doremi(docs)


# ------------------------------------------------------------- snippets
def test_best_snippet_covers_most_query_terms(spark):
    from adtl_spark.operators.retrieval import best_snippet

    docs = spark.createDataFrame(
        [
            (1, "x x x spark hash join x x spark x"),
            (2, "spark y y y y y y y y y y y y hash y join"),
        ],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(1, "spark hash join")], "query_id long, query string"
    )
    rows = {
        r["doc_id"]: r
        for r in best_snippet(docs, qdf, w=5, n_docs=2).collect()
    }
    # doc 1: window starting at 'spark' (pos 3) covers spark+hash+join
    assert rows[1]["snippet_start"] == 3
    assert rows[1]["n_terms"] == 3
    assert rows[1]["snippet"] == "spark hash join x x"
    # doc 2: terms are spread wider than w=5 -> best window covers 2
    assert rows[2]["n_terms"] == 2
    assert rows[2]["snippet_start"] == 13  # 'hash ... join' window
    assert rows[2]["snippet"].startswith("hash")


def test_best_snippet_tie_breaks_to_earliest_position(spark):
    from adtl_spark.operators.retrieval import best_snippet

    docs = spark.createDataFrame(
        [(1, "a b z z z a b")], "doc_id long, text string"
    )
    qdf = spark.createDataFrame([(1, "a b")], "query_id long, query string")
    row = best_snippet(docs, qdf, w=2, n_docs=1).collect()[0]
    assert (row["snippet_start"], row["n_terms"], row["snippet"]) == (
        0,
        2,
        "a b",
    )


# ------------------------------------------------------ metric invariants
def test_ndcg_bounded_and_one_iff_identical_on_random_rankings(spark):
    import random

    rng = random.Random(71)
    k = 5
    for trial in range(4):
        truth_rows, approx_rows = [], []
        for qid in (1, 2):
            t_docs = rng.sample(range(100, 130), k)
            a_docs = rng.sample(range(100, 130), k)
            truth_rows += [(qid, d, i + 1) for i, d in enumerate(t_docs)]
            approx_rows += [(qid, d, i + 1) for i, d in enumerate(a_docs)]
        truth = _ranked_df(spark, truth_rows)
        approx = _ranked_df(spark, approx_rows)
        for r in R.ndcg_vs_truth(truth, approx, k=k).collect():
            assert 0.0 <= r["ndcg"] <= 1.0
            assert 0.0 <= r["mrr"] <= 1.0
        # identical rankings always score exactly 1
        for r in R.ndcg_vs_truth(truth, truth, k=k).collect():
            assert r["ndcg"] == 1.0 and r["mrr"] == 1.0


def test_rrf_improving_a_rank_never_lowers_fused_score(spark):
    base_b = [(1, 50, 1), (1, 51, 2), (1, 52, 3)]
    b = spark.createDataFrame(base_b, "query_id long, doc_id long, rank long")
    prev = None
    for rank_in_a in (3, 2, 1):  # doc 52 climbs system A
        a = spark.createDataFrame(
            [(1, 60, r) for r in (1, 2, 3) if r != rank_in_a]
            + [(1, 52, rank_in_a)],
            "query_id long, doc_id long, rank long",
        )
        score = {
            r["doc_id"]: r["rrf"]
            for r in R.rrf_fuse_topk(a, b, k=10).collect()
        }[52]
        if prev is not None:
            assert score > prev
        prev = score


def test_lpa_labels_are_vertex_ids_and_deterministic(spark):
    pairs = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (2, 3), (3, 4), (3, 5)], "g long, m long"
    )
    verts = spark.createDataFrame([(v,) for v in range(1, 6)], "v long")
    edges = cooccurrence_edges(pairs, "g", "m")
    r1 = sorted(
        tuple(r) for r in label_propagation(edges, verts, iters=3).collect()
    )
    r2 = sorted(
        tuple(r) for r in label_propagation(edges, verts, iters=3).collect()
    )
    assert r1 == r2
    vset = set(range(1, 6))
    assert all(c in vset for _, c in r1)


# -------------------------------------------------------------- HTML ----
def test_html_to_text_strips_blocks_tags_entities(spark):
    from adtl_spark.operators.text import html_to_text

    html = (
        "<html><head><title>skip me</title></head><body>"
        "<script>var x = '<p>no</p>';</script>"
        "<style>.a { color: red }</style>"
        "<!-- hidden -->"
        "<h1>Title</h1><p>Hello &amp; welcome to <b>the</b> corpus.</p>"
        "<ul><li>one</li><li>two&nbsp;three</li></ul>"
        "<div>4 &lt; 5 &gt; 3</div></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert "skip me" not in out and "var x" not in out
    assert "color" not in out and "hidden" not in out
    lines = out.split("\n")
    assert "Title" in lines
    assert "Hello & welcome to the corpus." in out
    assert "one" in lines and "two three" in lines
    assert "4 < 5 > 3" in out


def test_html_to_text_composes_with_warc_response_records(spark, tmp_path):
    from adtl_spark.operators.text import html_to_text
    from adtl_spark.sources.io import parse_warc_records, read_text_dir

    body = "<html><body><p>crawled page</p></body></html>"
    warc = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://example.com/p\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
        f"{body}\r\n"
    )
    d = tmp_path / "warc3"
    d.mkdir()
    (d / "f.warc").write_text(warc)
    recs = parse_warc_records(read_text_dir(spark, str(d), whole_files=True))
    out = (
        recs.filter(F.col("warc_type") == "response")
        .select(html_to_text(F.col("content")).alias("text"))
        .collect()
    )
    assert out[0]["text"] == "crawled page"

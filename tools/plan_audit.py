"""Automated physical-plan audit of every registry query.

For each query (at sf0.001 so eager index-build collects stay cheap) the
tool compiles the plan and reports the scale-relevant shape facts a
reviewer would otherwise extract by hand from .explain():

- #Exchange (shuffles), #Scan parquet, #BroadcastHashJoin,
  #SortMergeJoin, #CartesianProduct / BroadcastNestedLoopJoin,
  whole-stage-codegen span count;
- a FLAG column when a plan contains a cartesian product or a
  sort-merge join not on the allowlist below (big-fact joins that are
  legitimately shuffle joins).

Exit code 1 if any non-allowlisted cartesian/SMJ appears — wired as a
regression gate, not just a report.  AQE is disabled for the audit
session so codegen spans and join strategies print deterministically
(see .claude/skills/verify gotcha).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adtl_spark import queries as Q  # noqa: E402
from adtl_spark.session import get_spark  # noqa: E402

# Queries where a SortMergeJoin is the RIGHT plan (fact-to-fact joins on
# keys where neither side is broadcastable at scale), with the reason.
SMJ_ALLOWED = {
    "w5_asof_join": "event-to-event as-of: both sides are fact-sized",
    "w6_range_join": "binned range join: both sides fact-sized",
    "w7_asof_forward": "as-of twin of w5",
    "w8_asof_nearest": "as-of twin of w5",
    "w9_funnel": "step-to-step funnel over the events fact",
    "olap_basket_lift": "within-order pair self-join: both sides are the lineitem fact",
    "w10_retention": "cohort-to-activity self-join over events",
    "q7_volume_shipping": "lineitem<->orders fact join",
    "q8_market_share": "lineitem<->orders fact join",
    "q9_product_profit": "lineitem<->orders fact join",
    "q12_shipping_delay": "lineitem<->orders fact join",
    "q21_waiting_supplier": "lineitem<->orders fact join",
    "q3_shipping_priority": "lineitem<->orders fact join",
    "q5_local_supplier_volume": "lineitem<->orders fact join",
    "q10_returned_items": "lineitem<->orders fact join",
    "q18_large_volume_customer": "lineitem<->orders fact join",
    "graph_pagerank": "edge<->rank iteration joins: both fact-sized",
    "graph_triangles": "edge<->edge wedge joins: both fact-sized",
    "w1_sessionize": "session window over events fact",
    "dedup_incremental": "corpus-side band join",
    "corpus_merge_upsert": "snapshot<->batch full-outer merge",
    "w11_scd2": "snapshot-to-snapshot change join",
    "pipeline_corpus_clean": "near-dup pair join inside the pipeline",
    "dedup_cluster": "CC iteration edge<->label joins",
    "text_containment": (
        "canonical-pair <-> duplicate-membership expansion joins: both "
        "sides corpus-grain (membership is one row per raw document)"
    ),
    "pref_rater_kappa": (
        "label<->label self-join on the item key (both sides are the "
        "full label fact — the contingency-table shape) and the "
        "marginal<->marginal join (both sides rater-pair x label "
        "grained: with crowdsourced rater counts neither is "
        "guaranteed broadcastable; AQE converts at runtime when small)"
    ),
    "graph_entity_resolution": (
        "CC iteration edge<->label joins plus the record<->entity-label "
        "re-attach join: both sides record-grain"
    ),
    "dedup_keep_best": "pair<->cluster joins",
    "corpus_unigram_logprob": (
        "doc-grain left join re-attaching zero-token docs to the doc-grain "
        "score relation: both sides corpus-sized (the LM model itself "
        "broadcasts)"
    ),
    "corpus_bigram_logprob": (
        "doc-grain head<->pair-sum join: both sides corpus-sized (vocab/"
        "bigram/ctx model relations all broadcast)"
    ),
    "dedup_semantic": (
        "distinct-vector threat self-join on the cluster key: both sides "
        "are the collapsed corpus, neither broadcastable"
    ),
    "dedup_minhash_recall": "contains the exact n-gram truth join it measures",
    "dedup_embedding_recall": "contains the exact all-pairs truth side twice",
    "ann_lsh_recall": "contains the exact cosine truth side",
    "ann_pq_recall": "contains the exact L2 truth side",
    "ann_pq_rerank_recall": "contains the exact L2 truth side (rerank twin)",
    "ann_ivfpq_recall": "contains the exact L2 truth side (IVF-PQ twin)",
    "ann_ivfpq_rerank_recall": "contains the exact L2 truth side (IVF-PQ rerank twin)",
    "ann_ivfpq_residual_recall": "contains the exact L2 truth side (residual-IVFADC twin)",
    "multimodal_dhash_recall": (
        "the banding candidate self-join it measures: both sides are "
        "corpus-grain block rows (plus the tiny truth<->found "
        "per-distance join, AQE-broadcast in production)"
    ),
    "sample_split_leakage_safe": (
        "corpus<->cluster-label re-attach join: the label relation is "
        "one row per document appearing in a near-dup pair — corpus-"
        "grain on a dup-heavy corpus, not broadcastable"
    ),
}

# Reason-pattern check: when an allowlisted query's plan DOES contain a
# SortMergeJoin, every SMJ key pair (expression-ids stripped) must match
# the query's expected-key regex — the keys the written reason describes.
# An SMJ on OTHER keys under an allowlisted name (e.g. a dimension join
# that lost its broadcast hint) is a plan regression and flags as
# SMJ-key-drift instead of hiding behind the name.  Names without an
# entry fall back to name-only allowlisting.
_FACT_ORDERKEY = r"orderkey"
SMJ_EXPECT = {
    "w5_asof_join": r"__bin__",
    "w6_range_join": r"__bin__|event_id",
    "w7_asof_forward": r"__bin__",
    "w8_asof_nearest": r"__bin__",
    "w9_funnel": r"user_id",
    "olap_basket_lift": r"ok|l_orderkey",
    "w10_retention": r"user_id",
    "w1_sessionize": r"user_id",
    "q3_shipping_priority": _FACT_ORDERKEY,
    "q5_local_supplier_volume": _FACT_ORDERKEY,
    "q7_volume_shipping": _FACT_ORDERKEY,
    "q8_market_share": _FACT_ORDERKEY,
    "q9_product_profit": _FACT_ORDERKEY,
    "q10_returned_items": _FACT_ORDERKEY,
    "q12_shipping_delay": _FACT_ORDERKEY,
    "q18_large_volume_customer": _FACT_ORDERKEY,
    "q21_waiting_supplier": _FACT_ORDERKEY,
    "graph_pagerank": r"\bsrc\b|\bdst\b|\bv\b",
    "graph_triangles": r"\bu\b|\ba2\b|\bb2\b|\bsrc\b|\bdst\b",
    "dedup_incremental": r"\bsh\b|band|id_a|id_b",
    "corpus_merge_upsert": r"__id|__iid",
    "pipeline_corpus_clean": r"id",
    "dedup_cluster": r"node|label|src|dst|id_a|id_b",
    "text_containment": r"\bsrc\b|\bdst\b",
    "graph_entity_resolution": r"node|label|src|dst|id_a|id_b|^id$|#id\b|\bid\b",
    "dedup_keep_best": r"doc_id|node",
    "corpus_unigram_logprob": r"doc_id|__did__",
    "corpus_bigram_logprob": r"__did__",
    "dedup_semantic": r"\brep\b",
    "dedup_minhash_recall": r"id_a|id_b",
    "dedup_embedding_recall": r"id_a|id_b",
    "ann_lsh_recall": r"query_id|corpus_id",
    "ann_pq_recall": r"query_id|corpus_id",
    "ann_pq_rerank_recall": r"query_id|corpus_id",
    "ann_ivfpq_recall": r"query_id|corpus_id",
    "ann_ivfpq_rerank_recall": r"query_id|corpus_id",
    "ann_ivfpq_residual_recall": r"query_id|corpus_id",
    "multimodal_dhash_recall": r"\bblk\b|\bval\b|hamming",
    "sample_split_leakage_safe": r"doc_id|__sls_node__|node|label|src|dst",
}


def smj_key_pairs(plan: str) -> list[str]:
    """Normalized 'lhs|rhs' key strings of every SortMergeJoin in the
    plan, expression ids stripped."""
    pairs = re.findall(r"SortMergeJoin(?: \w+hashjoin)?\s*\[([^\]]*)\], \[([^\]]*)\]", plan)
    return [
        re.sub(r"#\d+L?", "", a) + "|" + re.sub(r"#\d+L?", "", b)
        for a, b in pairs
    ]


def smj_drift(name: str, plan: str) -> list[str]:
    """Key pairs of allowlisted-name SMJs that do NOT match the expected
    pattern — non-empty means a plan regression hiding behind the name."""
    pattern = SMJ_EXPECT.get(name)
    if pattern is None:
        return []
    return [kp for kp in smj_key_pairs(plan) if not re.search(pattern, kp)]
# BroadcastNestedLoopJoin is tolerated only for tiny-literal cross joins
# (1-row thresholds, query sets) — flagged otherwise.
BNLJ_ALLOWED_PATTERNS = ("crossJoin", "threshold", "recall", "budget")

# Row-at-a-time Python (BatchEvalPython) is the slow path; only the
# reference-mandated uuid5 UDF may use it.  Arrow-batched operators
# (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
# sanctioned Python path and are not flagged.
ROW_PYTHON_ALLOWED = {"p14_uuid5"}


def audit(name: str, df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "name": name,
        "exchanges": plan.count("Exchange"),
        "scans": plan.count("Scan parquet"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "cart": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "wsc": len(re.findall(r"\*\(\d+\)", plan)),
        "rowpy": plan.count("BatchEvalPython"),
        "smj_drift": smj_drift(name, plan) if name in SMJ_ALLOWED else [],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("plan_audit")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bad = []
    print(f"{'query':34s} {'exch':>4} {'scan':>4} {'bhj':>3} {'smj':>3} "
          f"{'cart':>4} {'bnlj':>4} {'wsc':>3}  flag")
    for name, fn in Q.all_queries().items():
        if only and name not in only:
            continue
        try:
            row = audit(name, fn(spark, sf_dir))
        except Exception as e:
            bad.append(name)
            print(f"{name:34s} PLAN ERROR: {type(e).__name__}: {str(e)[:80]}")
            continue
        flags = []
        if row["cart"]:
            flags.append("CARTESIAN")
        if row["smj"] and name not in SMJ_ALLOWED:
            flags.append("SMJ-unallowlisted")
        if row["smj_drift"]:
            flags.append(f"SMJ-key-drift:{row['smj_drift'][0][:40]}")
        if row["rowpy"] and name not in ROW_PYTHON_ALLOWED:
            flags.append("row-at-a-time-Python")
        if flags:
            bad.append(name)
        print(
            f"{row['name']:34s} {row['exchanges']:4d} {row['scans']:4d} "
            f"{row['bhj']:3d} {row['smj']:3d} {row['cart']:4d} "
            f"{row['bnlj']:4d} {row['wsc']:3d}  {','.join(flags)}"
        )
    if bad:
        print(f"\nFLAGGED: {bad}")
        sys.exit(1)
    print("\nplan audit clean")


if __name__ == "__main__":
    main()

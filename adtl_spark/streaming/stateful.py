"""Custom stateful streaming operators via applyInPandasWithState.

The built-in watermarked windows (pipeline.py) cover time-bucketed rollups;
these operators need *arbitrary* per-key state:

- **streaming exact dedup** — emit each document the first time its content
  hash is seen, drop replays.  State per shard group is the set of seen
  hashes.  State here is unbounded by design (NoTimeout): a processing-time
  timeout would bound it, but Spark then schedules timeout-check
  micro-batches forever — incompatible with availableNow/test triggers; at
  production scale, bound the horizon by restarting from a snapshot or
  switching to ProcessingTimeTimeout under a continuous trigger.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = "doc_id long, text_hash string"
STATE_SCHEMA = "seen array<string>"


def _dedup_group(
    key: Any,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out_ids: list[int] = []
    out_hashes: list[str] = []
    for pdf in batches:
        for doc_id, text_hash in zip(pdf["doc_id"], pdf["text_hash"]):
            if text_hash not in seen:
                seen.add(text_hash)
                out_ids.append(int(doc_id))
                out_hashes.append(text_hash)
    state.update((list(seen),))
    yield pd.DataFrame({"doc_id": out_ids, "text_hash": out_hashes})


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shards: int = 64,
) -> DataFrame:
    """First-seen filter over a document stream.

    Content hash -> shard key (so state is spread over ``shards`` groups
    instead of one giant group); within each shard the pandas-with-state
    function keeps the seen-hash set and emits only novel documents.
    """
    hashed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("text_hash"),
    ).withColumn(
        "shard", F.pmod(F.xxhash64("text_hash"), F.lit(shards)).cast("int")
    )
    return hashed.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TREND_OUT_SCHEMA = "token string, cnt long"
TREND_STATE_SCHEMA = "toks array<string>, cnts array<long>"


def _trending_group(
    key: Any,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    k = int(key[1])  # (shard, k) composite grouping key
    if state.exists:
        toks, cnts = state.get
        counters = dict(zip(toks, (int(c) for c in cnts)))
    else:
        counters = {}
    for pdf in batches:
        for tok, c in pdf["token"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > k:
            cut = sorted(counters.values(), reverse=True)[k]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    state.update((list(counters.keys()), list(counters.values())))
    if counters:
        yield pd.DataFrame(
            {"token": list(counters.keys()), "cnt": list(counters.values())}
        )


def stream_trending_tokens(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    shards: int = 16,
) -> DataFrame:
    """Running trending-token summaries over a document stream: each
    micro-batch updates per-shard Misra-Gries counter tables (the same
    mergeable batch-fold as sketches.heavy_hitters, kept as ARBITRARY
    per-key state across batches via ``applyInPandasWithState``) and
    emits the shard's current k-counter summary.

    The contract mirrors the batch operator's sketch phase: each emitted
    summary is a superset witness for every token with shard-stream
    count > n_shard/k (undercount bounded by n_shard/(k+1)); a
    downstream exact recount (batch join, or a second aggregation over
    the union of shard summaries) finalizes exact counts.  State per
    shard is at most k (token, count) pairs — bounded regardless of
    stream length, the property that makes it deployable on an unbounded
    stream (contrast stream_dedup_exact's by-design unbounded seen-set).
    Tokens shard by hash so the per-key state and work spread evenly."""
    toks = _sharded_tokens(docs, k, text_col, shards)
    return toks.groupBy("shard", "k").applyInPandasWithState(
        _trending_group,
        outputStructType=TREND_OUT_SCHEMA,
        stateStructType=TREND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _sharded_tokens(
    docs: DataFrame, k: int, text_col: str, shards: int
) -> DataFrame:
    "Shared tokenize + hash-shard projection for the trending operators."
    return docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("token")
    ).select(
        "token",
        F.pmod(F.xxhash64("token"), F.lit(shards)).cast("int").alias("shard"),
        F.lit(k).alias("k"),
    )


def trending_summaries_batch(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    shards: int = 16,
) -> DataFrame:
    """BATCH twin of :func:`stream_trending_tokens`: the same per-shard
    Misra-Gries fold (the exact ``_trending_group`` counter logic) run
    over each shard as one mega-batch via ``applyInPandas`` — what the
    stream's state converges to after consuming the whole corpus in one
    micro-batch.  Deterministic despite the imperative fold: with a
    single batch per shard the counter table is the exact per-shard
    frequency map (commutative adds) and the single final k-cut is
    order-free.  Emits the per-shard (token, cnt) summaries."""
    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        kk = int(pdf["k"].iloc[0])
        counters: dict[str, int] = {}
        for tok, c in pdf["token"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > kk:
            cut = sorted(counters.values(), reverse=True)[kk]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
        return pd.DataFrame(
            {"token": list(counters.keys()), "cnt": list(counters.values())}
        )

    toks = _sharded_tokens(docs, k, text_col, shards)
    return toks.groupBy("shard", "k").applyInPandas(
        fold, schema="token string, cnt long"
    )


def finalize_trending(
    summaries: DataFrame,
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    shards: int = 16,
) -> DataFrame:
    """Batch finalizer over trending-token summaries: the downstream
    exact-recount step the streaming operator's contract promises.

    The summary union is a SUPERSET witness of every token with global
    count > n/(k+1): tokens shard by hash, so a token's whole stream
    lands in one shard, and its retained per-shard count stays positive
    whenever its count exceeds n_shard/(k+1) <= n/(k+1) (Misra-Gries
    undercount bound; merge-safe per Agarwal et al., PODS'12).  Exactly
    recounting the candidates and thresholding at the STRICTLY LARGER
    n/k therefore yields an exact, deterministic, summary-independent
    result — which is what makes a one-line frequency query a full
    oracle even though the summaries themselves are order-sensitive.

    Scale shape: candidates are <= shards*k rows (broadcast); the corpus
    contributes one semi-joined exploded pass with map-side partial
    counts.  Works unchanged on summaries collected from the live stream
    (tests/test_streaming.py) or from :func:`trending_summaries_batch`."""
    cand = F.broadcast(summaries.select("token").distinct())
    toks = _sharded_tokens(docs, k, text_col, shards).select("token")
    total = toks.count()
    return (
        toks.join(cand, "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > total / k)
        .orderBy(F.desc("cnt"), F.asc("token"))
    )


DEBOUNCE_OUT_SCHEMA = "user_id long, event_type string, event_id long, ts long"
DEBOUNCE_STATE_SCHEMA = "last_kept long"


def stream_debounce_last_kept(
    events: DataFrame,
    window_ns: int,
    id_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The PREVIOUS-KEPT debounce: an event is kept iff it arrives more
    than ``window_ns`` after the last KEPT event of its (user, type) —
    the rate-limit semantics (at most one survivor per window, however
    long the burst).  This variant is inherently sequential (each
    decision depends on prior decisions), which is exactly what
    per-group streaming state is for: the state is ONE long per key
    (the last kept timestamp), batches scan their key's rows in
    (ts, id) order against it, and the batch gaps-and-islands form
    (queries.w19_dedup_debounce) is the relational twin for the
    trailing-reset semantics.  State is O(1) per key — bounded however
    long the stream runs."""

    def _debounce_group(key, batches, state):
        last = int(state.get[0]) if state.exists else None
        frames = [pdf for pdf in batches]
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        keep = []
        for ts, eid in zip(pdf["ts"], pdf["event_id"]):
            if last is None or int(ts) - last > window_ns:
                keep.append((int(eid), int(ts)))
                last = int(ts)
        state.update((last,))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(keep),
                "event_type": [str(key[1])] * len(keep),
                "event_id": [e for e, _ in keep],
                "ts": [t for _, t in keep],
            }
        )

    base = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").cast("string").alias("event_type"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(ts_col).cast("long").alias("ts"),
    )
    return base.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_group,
        outputStructType=DEBOUNCE_OUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

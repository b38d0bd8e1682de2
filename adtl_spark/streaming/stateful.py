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

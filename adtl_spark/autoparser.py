"""autoparser subsystem (SURVEY.md §2.11): spec generation tooling.

The reference's autoparser profiles a source dataset into a *data
dictionary*, asks an LLM to describe/map fields, and emits a TOML spec
(src/adtl/autoparser/).  Here:

- **AP1 dictionary inference** is a real, distributed Spark operator:
  per-column type sniffing and common-value profiling run as aggregations
  over the whole dataset (the reference profiles a pandas frame in
  memory) with the same privacy guard (values occurring in >30% of rows
  are never listed as "common values" for free-text columns).
- **AP2/AP4/AP5 (LLM description & mapping)** are build-time, network-bound
  steps — stubbed behind ``NotImplementedError`` with their exact
  signatures; wiring any OpenAI-compatible client in is a caller concern.
- **AP6 TOML generation** emits a runnable skeleton spec from the inferred
  dictionary (value maps left for the human/LLM pass).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adtl_spark.functions import render as R


def infer_dictionary(
    df: DataFrame,
    max_common_count: int = 8,
    common_frac_guard: float = 0.3,
    sample_rows: int | None = None,
) -> list[dict[str, Any]]:
    """AP1: per-column profile — inferred type, null rate, common values.

    Mirrors DictWriter.create_dict semantics
    (src/adtl/autoparser/dict_writer.py:84-185): a value counts as
    "common" when it repeats (freq > 1) and at most ``max_common_count``
    distinct values qualify; columns whose top value exceeds
    ``common_frac_guard`` of rows are profiled, but free-text columns
    (too many distincts) get no value list.  List-ish columns are sniffed
    by '[' / ',' prefixes.

    Implementation is one aggregation pass for the scalar stats plus one
    grouped count per candidate column — all distributed, no driver-side
    row loops.
    """
    if sample_rows:
        df = df.limit(sample_rows)
    total = df.count()
    out: list[dict[str, Any]] = []
    if total == 0:
        return [{"field": c, "type": "unknown", "null_frac": 1.0, "common_values": None} for c in df.columns]

    stat_aggs = []
    for c in df.columns:
        s = F.col(c).cast("string")
        present = F.when(s.isNotNull() & (s != ""), s)
        stat_aggs += [
            F.count(present).alias(f"{c}__n"),
            F.count_distinct(present).alias(f"{c}__distinct"),
            F.sum(R.is_int_string(present).cast("int")).alias(f"{c}__ints"),
            F.sum(R.is_numeric_string(present).cast("int")).alias(f"{c}__nums"),
            F.sum(
                (present.startswith("[") | present.contains(",")).cast("int")
            ).alias(f"{c}__listish"),
        ]
    stats = df.agg(*stat_aggs).collect()[0]

    for c in df.columns:
        n = stats[f"{c}__n"] or 0
        n_distinct = stats[f"{c}__distinct"] or 0
        profile: dict[str, Any] = {
            "field": c,
            "null_frac": round(1 - n / total, 4),
        }
        if n == 0:
            profile["type"] = "unknown"
            profile["common_values"] = None
            out.append(profile)
            continue
        if stats[f"{c}__ints"] == n:
            profile["type"] = "integer"
        elif stats[f"{c}__nums"] == n:
            profile["type"] = "number"
        elif (stats[f"{c}__listish"] or 0) > n * 0.5:
            profile["type"] = "list"
        else:
            profile["type"] = "string"

        common = None
        if profile["type"] in ("string", "integer") and 0 < n_distinct <= max(
            max_common_count * 4, 32
        ):
            counts = (
                df.select(F.col(c).cast("string").alias("v"))
                .filter(F.col("v").isNotNull() & (F.col("v") != ""))
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .orderBy(F.col("n").desc(), F.col("v"))
                .limit(max_common_count + 1)
                .collect()
            )
            values = [r["v"] for r in counts]
            if values and len(values) <= max_common_count:
                top_frac = counts[0]["n"] / total
                # privacy guard: a dominant free-ish value set is fine, but
                # if the column is near-unique we never list raw values
                if n_distinct <= max_common_count or top_frac >= common_frac_guard:
                    common = values
        profile["common_values"] = common
        out.append(profile)
    return out


def generate_spec_skeleton(
    dictionary: list[dict[str, Any]],
    name: str = "generated",
    group_by: str | None = None,
) -> dict[str, Any]:
    """AP6: runnable skeleton spec from an inferred dictionary — every
    column mapped as a plain field rule (value maps are the LLM/human
    pass); groupBy wiring when a key column is named."""
    table_meta: dict[str, Any] = {"kind": "oneToOne"}
    if group_by:
        table_meta = {
            "kind": "groupBy",
            "groupBy": group_by,
            "aggregation": "lastNotNull",
        }
    rules = {
        entry["field"]: {"field": entry["field"]}
        for entry in dictionary
    }
    return {
        "adtl": {
            "name": name,
            "description": f"auto-generated from {len(dictionary)} profiled columns",
            "tables": {"data": table_meta},
        },
        "data": rules,
    }


def describe_fields_llm(dictionary: list[dict[str, Any]], language: str = "en") -> None:
    """AP2 stub: would call an OpenAI/Gemini-compatible structured-output
    endpoint to translate/describe column headers.  Network/LLM access is a
    caller concern; not available here."""
    raise NotImplementedError(
        "LLM description generation requires an external model endpoint"
    )


def map_fields_llm(
    dictionary: list[dict[str, Any]], target_schema: dict[str, Any]
) -> None:
    """AP4/AP5 stub: LLM source->target field and value mapping."""
    raise NotImplementedError("LLM field mapping requires an external model endpoint")

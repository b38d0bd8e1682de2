"""One-pass dataset profiling report: per table, per column — null
fraction, approx distinct count, numeric min/max/mean, string length
min/max/mean — emitted as one JSON document.

The profile of each table is ONE aggregation (all per-column stats fold
into a single map-side-combined pass; no per-column jobs, no collect of
data rows), so profiling a 100 TB lakehouse costs one scan per table.
Approximate distincts use Spark's native HLL++ (approx_count_distinct,
rsd 5%) — this is an operational report, not an oracle-gated result, so
the approximate sketch is the right tool (the exact/own-HLL paths live
in operators/sketches.py for the gated surface).

Usage: python tools/dataset_report.py [sf_dir] [table ...]
Library: report_table(df) / report_dataset(spark, sf_dir, tables).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_NUMERIC = {"long", "integer", "double", "float", "short", "decimal"}


def report_table(df: DataFrame) -> dict:
    aggs = [F.count(F.lit(1)).alias("__rows__")]
    for f in df.schema.fields:
        c, t = f.name, f.dataType.typeName()
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c, 0.05).alias(f"{c}__distinct"))
        if t in _NUMERIC:
            aggs += [
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
                F.avg(F.col(c).cast("double")).alias(f"{c}__mean"),
            ]
        elif t == "string":
            ln = F.length(c)
            aggs += [
                F.min(ln).alias(f"{c}__min_len"),
                F.max(ln).alias(f"{c}__max_len"),
                F.avg(ln.cast("double")).alias(f"{c}__mean_len"),
            ]
        elif t == "array":
            sz = F.size(c)
            aggs += [
                F.min(sz).alias(f"{c}__min_size"),
                F.max(sz).alias(f"{c}__max_size"),
            ]
    row = df.agg(*aggs).collect()[0].asDict()
    n = row.pop("__rows__")
    out: dict = {"rows": n, "columns": {}}
    for f in df.schema.fields:
        c = f.name
        col: dict = {"type": f.dataType.simpleString()}
        for key, val in list(row.items()):
            if key.startswith(c + "__"):
                stat = key[len(c) + 2:]
                if stat == "nulls":
                    col["null_frac"] = round(val / n, 6) if n else None
                else:
                    col[stat] = (
                        round(val, 4) if isinstance(val, float) else val
                    )
        out["columns"][c] = col
    return out


def report_dataset(spark, sf_dir: str, tables: list[str]) -> dict:
    return {
        t: report_table(spark.read.parquet(f"{sf_dir}/{t}.parquet"))
        for t in tables
    }


def main() -> None:
    from adtl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tables = sys.argv[2:] or TABLES
    spark = get_spark("dataset_report")
    print(json.dumps(report_dataset(spark, sf_dir, tables), indent=2))


if __name__ == "__main__":
    main()

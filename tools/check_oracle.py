"""Local twin of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the same scale factor;
compare row count, column names/types and order-insensitive values.

Usage: python tools/check_oracle.py [--json OUT] [sf_dir] [query ...]

--json OUT additionally writes per-query records in the driver's
CORRECTNESS_r*.json shape (rows/schema/hash matches, row counts, err;
rows-only queries carry "rows_only": true) — the committed
CORRECTNESS_LOCAL_r*.json artifact that gives the registry tail past the
50-slot driver window a machine-readable green at HEAD
(tests/test_plans.py enforces coverage and greenness).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> str | None:
    if len(sdf) != len(odf):
        return f"row count {len(sdf)} vs {len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    # Typed-hash tripwire: the driver hashes *typed* values, so a DuckDB
    # HUGEINT (surfacing as float64/object in pandas) against an integral
    # Spark column diverges even when every value is equal.  Value-compare
    # below would silently pass (float compare), so fail here first — the
    # fix is always CAST(... AS BIGINT) on the oracle expression.
    for c in sdf.columns:
        if sdf[c].dtype.kind in "iu" and odf[c].dtype.kind in "fO":
            return (
                f"col {c}: Spark dtype {sdf[c].dtype} vs oracle dtype "
                f"{odf[c].dtype} — uncast HUGEINT-widened oracle expression?"
                " Wrap it in CAST(... AS BIGINT)."
            )
    a, b = normalize(sdf), normalize(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np

            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = af.isna() & bf.isna()
            eq = (af == bf) | both_nan
            if not eq.all():
                idx = (~eq).idxmax()
                return f"col {c} first diff at {idx}: {af[idx]!r} vs {bf[idx]!r}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                idx = neq.idxmax()
                return f"col {c} first diff at {idx}: {av[idx]!r} vs {bv[idx]!r}"
    return None


def main() -> None:
    import __spark_entry__ as entrymod
    from adtl_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # Registry invariants, checked before any query runs so a silently
    # dropped oracle or a stray oracle key fails loudly even on subset runs.
    from adtl_spark.queries import ROWS_ONLY

    unaccounted = [k for k in qs if k not in oracles and k not in ROWS_ONLY]
    stray = [k for k in oracles if k not in qs]
    both = [k for k in ROWS_ONLY if k in oracles]
    if unaccounted or stray or both:
        print(f"REGISTRY ERROR: no oracle and no ROWS_ONLY reason: {unaccounted}")
        print(f"REGISTRY ERROR: oracle without query: {stray}")
        print(f"REGISTRY ERROR: ROWS_ONLY but oracle exists: {both}")
        sys.exit(1)
    gate = list(qs)[:50]
    print(
        f"registry: {len(qs)} queries, {len(oracles)} oracles, "
        f"{len(ROWS_ONLY)} rows-only; driver gate covers the first 50"
    )
    past_cap = list(qs)[50:]
    if past_cap:
        print(f"past the 50-query gate cap this round: {', '.join(past_cap)}")
    del gate

    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark error {type(e).__name__}: {str(e)[:200]}",
            }
            continue
        if name not in oracles:
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL  {name}: rows-only query returned 0 rows")
            else:
                print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            # rows-only queries still carry a real signal: a 0-row
            # regression must read red in the committed artifact
            results[name] = {
                "rows_only": True,
                "rows_match": len(sdf) > 0,
                "spark_rows": len(sdf),
                "err": None,
            }
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {str(e)[:200]}")
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": len(sdf),
                "oracle_rows": None,
                "err": f"oracle error {type(e).__name__}: {str(e)[:200]}",
            }
            continue
        diff = compare(sdf, odf)
        schema_bad = diff is not None and (
            diff.startswith("columns") or " dtype " in diff
        )
        rows_bad = diff is not None and diff.startswith("row count")
        results[name] = {
            "rows_match": not rows_bad,
            "schema_match": not (rows_bad or schema_bad),
            "hash_match": diff is None,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": diff,
        }
        if diff is None:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
            print(f"FAIL  {name}: {diff}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {len(results)} records to {json_out}")
    if failures:
        print("\nFAILURES:", ", ".join(failures))
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()

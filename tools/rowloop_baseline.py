"""Single-node throughput comparison: reference-style row interpreter vs
the compiled Spark engine, on the same spec and the same data.

The reference engine cannot run in this container (pint/fastjsonschema/
joblib are absent), so this measures an *equivalent-work* pure-Python row
loop — the same per-row operations its interpreter performs (dict access,
value-map lookup, numeric parse, min/set/any folds into a group dict),
written independently.  This is deliberately generous to the row loop: no
spec-walking overhead, no validation pass, no joblib pickling.

Usage: python tools/rowloop_baseline.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEX_MAP = {"A": "accepted", "R": "returned", "N": "none"}
RET_MAP = {"R": True, "A": False, "N": False}


def python_rowloop(rows) -> dict:
    """Equivalent of the adtl_engine_groupby spec: per-row value maps +
    numeric parse, grouped min/set/any folds."""
    groups: dict = {}
    for orderkey, qty, flag in rows:
        g = groups.get(orderkey)
        if g is None:
            g = groups[orderkey] = {"min": None, "set": set(), "any": False}
        try:
            q = int(qty)
        except ValueError:
            try:
                q = float(qty)
            except ValueError:
                q = None
        if q is not None and (g["min"] is None or q < g["min"]):
            g["min"] = q
        mapped = SEX_MAP.get(flag)
        if mapped is not None:
            g["set"].add(mapped)
        returned = RET_MAP.get(flag)
        if returned:
            g["any"] = True
    return groups


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    li = Path(sf_dir) / "lineitem.parquet"
    src = f"{li}/*.parquet" if li.is_dir() else str(li)  # Spark multi-part dirs
    raw = con.execute(
        f"""SELECT CAST(l_orderkey AS VARCHAR), CAST(l_quantity AS VARCHAR),
                   l_returnflag
            FROM '{src}'"""
    ).fetchall()
    n = len(raw)

    t0 = time.time()
    groups = python_rowloop(raw)
    loop_s = time.time() - t0

    from adtl_spark.queries import adtl_engine_groupby
    from adtl_spark.session import get_spark

    spark = get_spark()
    adtl_engine_groupby(spark, "/root/testdata/sf0.001").count()  # warm up JVM
    t0 = time.time()
    adtl_engine_groupby(spark, sf_dir).write.mode("overwrite").format("noop").save()
    engine_s = time.time() - t0

    print(
        f"rows={n}  groups={len(groups)}\n"
        f"python row loop (interpreter-equivalent): {loop_s:.2f}s "
        f"({n/loop_s/1000:.0f}k rows/s, single thread; excludes the "
        f"reference's spec-walking/validation overhead)\n"
        f"compiled Spark engine (full semantics):   {engine_s:.2f}s "
        f"({n/engine_s/1000:.0f}k rows/s on local[32])"
    )


if __name__ == "__main__":
    main()

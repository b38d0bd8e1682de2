"""Isolated per-query profiler for optimization work (guide §1).

Usage: python tools/profile_query.py [--explain DIR] [--warm N] [--timed N] q1 q2 ...

For each named registry query, in ONE fresh session per query:
  * warm it ``--warm`` times untimed (JVM codegen + Python worker pool),
  * run it ``--timed`` times against the noop sink with the timer around
    construction + materialization (bench.py methodology),
  * print per-run seconds and the min (steady state),
  * with --explain DIR, save ``df.explain('formatted')`` to DIR/<q>_<tag>.txt.

Timings are isolated probes — comparable to the verdict's adjudication
probes, not to in-suite bench numbers (which carry suite-context noise).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adtl_spark import queries as Q
from adtl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain", default=None, help="dir for explain output")
    ap.add_argument("--tag", default="before", help="suffix for explain files")
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--timed", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    all_q = Q.all_queries()
    for name in args.names:
        if name not in all_q:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            continue
        spark = get_spark("profile_" + name)
        try:
            from bench import _release_leaked_blocks

            for _ in range(args.warm):
                all_q[name](spark, args.sf_dir).write.mode(
                    "overwrite").format("noop").save()
                _release_leaked_blocks(spark)
            runs = []
            for _ in range(args.timed):
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t0 = time.time()
                df = all_q[name](spark, args.sf_dir)
                df.write.mode("overwrite").format("noop").save()
                runs.append(round(time.time() - t0, 3))
                _release_leaked_blocks(spark)
            print(f"{name}: runs={runs} min={min(runs)}", flush=True)
            if args.explain:
                os.makedirs(args.explain, exist_ok=True)
                df = all_q[name](spark, args.sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(
                        args.explain, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(txt)
        finally:
            spark.stop()


if __name__ == "__main__":
    main()

"""Per-query profiling harness for the optimization round (guide §1).

Times each headline query with the same session shape as bench.py
(but a separate file — bench.py is frozen), reports min/median of N
reps, and writes .explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage:
  python tools/profile_queries.py [--tag before] [--reps 5] [q01_... ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary", "q02_revenue_topk", "q04_brand_revenue",
    "q08_grouped_quantiles", "q11_exact_dedup", "q14_ngram_jaccard_pairs",
    "q15_embedding_topk", "q18_user_sessions", "q21_sketch_cardinalities",
    "q23_ranking_flagship", "q68_exact_quantiles_distributed",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    from outrank_spark.plans.queries import QUERIES

    spark = bench.make_spark(cpus)
    from pyspark.sql import functions as F
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").agg(
        F.count(F.lit(1)),
        F.sum(F.xxhash64("n_name").cast("decimal(38,0)")),
    ).collect()
    warm.limit(5).toPandas()
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        lambda it: it, "id long",
    ).count()

    names = args.queries or HEADLINE
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        if args.explain:
            try:
                plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution() \
                    .explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted"))
                os.makedirs("plans/r06", exist_ok=True)
                with open(f"plans/r06/{name}_{args.tag}.txt", "w") as f:
                    f.write(plan)
            except Exception as ex:  # sketch queries eager-compute
                print(f"  (no lazy plan for {name}: {type(ex).__name__})")
        samples = []
        for _ in range(args.reps):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(name, json.dumps(out[name]))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({k: v["min"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()

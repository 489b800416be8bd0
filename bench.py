"""Benchmark harness (driver contract).

Runs the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and the
north-rule feature-ranking throughput job over a deterministic
synthetic pages table, then prints ONE JSON line:

  {"metric": "headline suite wall time", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "pages_per_sec": <ranking throughput>, ...}

Scaling evidence mode (north rule: efficiency >= 0.8 from N to 4N):
``python bench.py --scaling`` reruns the ranking job in two fresh
subprocesses at local[8] and local[32] on identical input and reports
efficiency = (T8 / T32) / 4.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_topk",
    "q04_brand_revenue",
    "q08_grouped_quantiles",
    "q11_exact_dedup",
    "q14_ngram_jaccard_pairs",
    "q15_embedding_topk",
    "q18_user_sessions",
    "q21_sketch_cardinalities",
    "q23_ranking_flagship",
]

N_PAGES = int(os.environ.get("BENCH_PAGES", "300000"))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("outrank-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def ranking_throughput(spark, n_pages: int) -> tuple[float, float]:
    """North-rule job: derived features + sketches + MI ranking over
    the pages table.  Returns (seconds, pages/sec); generation cost is
    excluded by materializing the input first."""
    from pyspark.sql import functions as F

    from outrank_spark.operators.derived import with_web_features
    from outrank_spark.plans.ranking_job import RankingConfig, run_ranking
    from outrank_spark.sources import generate_pages

    pages = generate_pages(spark, n_pages, seed=42, max_tokens=64).cache()
    pages.count()  # materialize: generation excluded from the metric

    feats = with_web_features(pages).select(
        "host", "tld",
        F.col("lang").alias("label"),
        (F.col("text_len") / 100).cast("long").cast("string").alias("len_bucket"),
        (F.col("n_token") / 10).cast("long").cast("string").alias("tok_bucket"),
        F.date_format("ts_day", "yyyy-MM-dd").alias("day"),
    )
    t0 = time.time()
    res = run_ranking(spark, feats, RankingConfig(subsampling=1))
    assert len(res.pairwise) > 0
    dt = time.time() - t0
    pages.unpersist()
    return dt, n_pages / dt


def run_suite(cpus: int, sf_dir: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from outrank_spark.plans.queries import QUERIES

    spark = make_spark(cpus)
    try:
        times = {}
        for name in HEADLINE:
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.collect()
            times[name] = round(time.time() - t0, 3)
        rank_sec, pps = ranking_throughput(spark, N_PAGES)
        times["ranking_pages_job"] = round(rank_sec, 3)
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
        return {
            "metric": "headline suite wall time",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "sf": sf,
            "cpus": cpus,
            "pages_per_sec": round(pps, 1),
            "ranking_pages": N_PAGES,
        }
    finally:
        spark.stop()


def _scaling_child(cpus: int) -> float:
    spark = make_spark(cpus)
    try:
        dt, _ = ranking_throughput(spark, N_PAGES)
        return dt
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        # two fresh subprocesses so each gets an untouched JVM
        out = {}
        for n in (8, 32):
            r = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(n)],
                capture_output=True, text=True, check=True,
            )
            out[n] = float(r.stdout.strip().splitlines()[-1])
        eff = (out[8] / out[32]) / 4.0
        print(json.dumps({
            "metric": "ranking scaling efficiency local[8]->local[32]",
            "value": round(eff, 3), "unit": "efficiency",
            "t8_sec": round(out[8], 2), "t32_sec": round(out[32], 2),
            "pages": N_PAGES,
            "pages_per_sec_8": round(N_PAGES / out[8], 1),
            "pages_per_sec_32": round(N_PAGES / out[32], 1),
        }))
        return

    if "--scaling-child" in sys.argv:
        n = int(sys.argv[sys.argv.index("--scaling-child") + 1])
        print(_scaling_child(n))
        return

    print(json.dumps(run_suite(cpus, sf_dir)))


if __name__ == "__main__":
    main()

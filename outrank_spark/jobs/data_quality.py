"""spark-submit CLI: one-command data-quality report over a parquet
table — the admission gate as a runnable job, not just a library.

Composes the validation family (operators/validation.py +
srm-adjacent audits) into a single scan-efficient run::

    spark-submit --py-files outrank_spark.zip jobs/data_quality_job.py \
        --input /tables/pages --columns url,lang,text \
        --rules rules.json --benford text_len \
        --fd "url->lang" --skew_keys lang --report report.json

    python -m outrank_spark.jobs.data_quality --input ./docs.parquet

Sections (each optional except the profile):

- ``profile``  — always: per-column null rate / distinct / ranges
  (``--approx_distinct`` swaps the exact distinct pass for HLL).
- ``constraints`` — ``--rules FILE``: a JSON list of
  ``{"col", "rule", "value"?}`` rule dicts (see
  ``check_constraints``); ``--fail_on_violation`` exits 1 if any
  rule fails, so the job gates a pipeline in CI/Airflow.
- ``benford`` — ``--benford col1,col2``: first-digit forensic audit.
- ``fd`` — ``--fd "a->b" "x,y->z"``: approximate-FD discovery (g3).
- ``skew`` — ``--skew_keys k1,k2``: per-key Gini / top-share audit
  (the salting decision input).

Every section's output is a REPORT-sized table (columns x 9 digits,
rule count, FD count, one row per key) — the driver-side collect is
metadata, never corpus rows.  Prints ONE JSON document (stdout or
``--report``); exit code 1 only under ``--fail_on_violation``.

No reference-repo counterpart (the reference has no data-admission
tooling); Deequ-style practice re-derived on this engine's operators.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="data_quality",
        description="parquet table -> data-quality admission report",
    )
    ap.add_argument("--input", required=True,
                    help="parquet file/dir to audit")
    ap.add_argument("--columns", default=None,
                    help="csv subset of columns to profile (default all)")
    ap.add_argument("--rules", default=None,
                    help="JSON file: list of constraint rule dicts")
    ap.add_argument("--benford", default=None,
                    help="csv numeric columns for the first-digit audit")
    ap.add_argument("--fd", nargs="*", default=None, metavar="LHS->RHS",
                    help='FD candidates, e.g. "a->b" "x,y->z"')
    ap.add_argument("--skew_keys", default=None,
                    help="csv key columns for the skew (Gini) audit")
    ap.add_argument("--approx_distinct", action="store_true",
                    help="HLL distinct counts in the profile")
    ap.add_argument("--fail_on_violation", action="store_true",
                    help="exit 1 if any constraint rule fails")
    ap.add_argument("--report", default=None,
                    help="write the JSON report here (default stdout)")
    ap.add_argument("--spark_master", default=None)
    ap.add_argument("--shuffle_partitions", type=int, default=None)
    return ap


def _parse_fd(spec: str) -> tuple:
    if "->" not in spec:
        raise ValueError(
            f"FD spec must look like 'a->b' or 'x,y->z', got {spec!r}")
    lhs, rhs = spec.split("->", 1)
    lhs_cols = [c.strip() for c in lhs.split(",") if c.strip()]
    if not lhs_cols or not rhs.strip():
        raise ValueError(f"bad FD spec {spec!r}")
    return (lhs_cols if len(lhs_cols) > 1 else lhs_cols[0], rhs.strip())


def _rows(df) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def run_quality(spark, args) -> tuple[dict, bool]:
    """Build the report dict; returns (report, any_violation)."""
    from outrank_spark.operators.validation import (
        benford_audit,
        check_constraints,
        fd_violations,
        key_skew_audit,
        profile_table,
    )

    df = spark.read.parquet(args.input)
    cols = ([c.strip() for c in args.columns.split(",") if c.strip()]
            if args.columns else None)
    report: dict = {
        "input": args.input,
        "n_columns": len(cols or df.columns),
        "profile": _rows(profile_table(
            df, cols, approx_distinct=args.approx_distinct)),
    }
    violated = False
    if args.rules:
        with open(args.rules) as fh:
            rules = json.load(fh)
        got = _rows(check_constraints(df, rules))
        report["constraints"] = got
        violated = any(not r["passed"] for r in got)
    if args.benford:
        bcols = [c.strip() for c in args.benford.split(",") if c.strip()]
        report["benford"] = _rows(benford_audit(df, bcols))
    if args.fd:
        fds = [_parse_fd(s) for s in args.fd]
        report["fd"] = _rows(fd_violations(df, fds))
    if args.skew_keys:
        out = None
        for k in [c.strip() for c in args.skew_keys.split(",")
                  if c.strip()]:
            audit = key_skew_audit(df, k)
            out = audit if out is None else out.unionByName(audit)
        report["skew"] = _rows(out)
    return report, violated


def main(argv=None) -> int:
    from pyspark.sql import SparkSession

    args = build_parser().parse_args(argv)
    builder = SparkSession.builder.appName("outrank-spark-data-quality")
    if args.spark_master:
        builder = builder.master(args.spark_master)
    spark = builder.getOrCreate()
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(args.shuffle_partitions))
    t0 = time.time()
    try:
        report, violated = run_quality(spark, args)
    finally:
        spark.stop()
    report["sec"] = round(time.time() - t0, 2)
    report["passed"] = not violated
    doc = json.dumps(report, default=str)
    if args.report:
        with open(args.report, "w") as fh:
            fh.write(doc + "\n")
        print(json.dumps({"report": args.report,
                          "passed": report["passed"],
                          "sec": report["sec"]}))
    else:
        print(doc)
    return 1 if (violated and args.fail_on_violation) else 0


if __name__ == "__main__":
    sys.exit(main())

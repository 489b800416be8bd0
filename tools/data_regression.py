"""Data-proportion robustness experiment (reference
benchmarks/data_regression_experiment.sh): generate one synthetic
dataset, rank it at several row proportions through the CLI, then
score hits@k of each ranking against the largest-data ranking with
tools/analyse_rankings.py.

Usage:
  python tools/data_regression.py [workdir] [--rows 100000]
      [--features 60] [--proportions 0.125,0.25,0.5,1.0]

Writes ranking_<n_rows>/ folders + hits_at_k.tsv into workdir.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args: list[str], cwd: str) -> None:
    cmd = [sys.executable, os.path.join(REPO, "jobs", "rank_job.py"),
           *args]
    res = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-4000:])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("workdir", nargs="?", default="./data_regression")
    p.add_argument("--rows", type=int, default=100_000)
    p.add_argument("--features", type=int, default=60)
    p.add_argument("--proportions", type=str,
                   default="0.125,0.25,0.5,1.0")
    p.add_argument("--spark_master", type=str, default="local[8]")
    args = p.parse_args()

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    run_cli([
        "--task", "data_generator",
        "--num_synthetic_rows", str(args.rows),
        "--num_synthetic_features", str(args.features),
        "--spark_master", args.spark_master,
    ], workdir)

    proportions = [float(x) for x in args.proportions.split(",")]
    for prop in proportions:
        n = int(args.rows * prop)
        # subsampling keeps ~1/s rows -> s = 1/prop
        sub = max(1, round(1.0 / prop))
        out = os.path.join(workdir, f"ranking_{n}")
        print(f"ranking at {n} rows (subsampling {sub}) ...", flush=True)
        run_cli([
            "--task", "ranking",
            "--data_path", "test_data_synthetic",
            "--data_source", "csv-raw",
            "--subsampling", str(sub),
            "--output_folder", out,
            "--tldr", "False",
            "--spark_master", args.spark_master,
        ], workdir)
        run_cli([
            "--task", "ranking_summary",
            "--data_path", "test_data_synthetic",
            "--output_folder", out,
            "--spark_master", args.spark_master,
        ], workdir)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from analyse_rankings import analyse

    table = analyse(workdir)
    out_tsv = os.path.join(workdir, "hits_at_k.tsv")
    table.to_csv(out_tsv, sep="\t", index=False)
    print(table.to_csv(sep="\t", index=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

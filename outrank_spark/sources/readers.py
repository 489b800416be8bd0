"""Source readers for the reference's four dataset layouts
(core_utils.py:101-118 dispatch) — each returns a Spark DataFrame of
string feature columns plus the resolved numeric-column set.

| source       | layout                                            |
|--------------|---------------------------------------------------|
| csv-raw      | data.csv with a header row, latin1               |
| ob-csv       | data.csv + dataset_desc.json typed descriptor     |
| ob-vw        | sparse Vowpal-Wabbit lines + vw_namespace_map.csv |
| ob-raw-dump  | raw_data/1_train/* TSV shards + header file       |

The vw reader is the only nontrivial one: sparse ``|NS v1 v2`` groups
pivot to dense named columns through the namespace map
(core_utils.py:161-201 semantics).  Lines stream through
``spark.read.text`` + ``mapInPandas`` — the group split is pandas
str ops; the namespace pivot is per-row inside the Arrow batch (it is
a parser for an esoteric text format, not a hot-path operator).
Spark reads .gz natively; .zst would need a codec jar (documented
limitation).
"""
from __future__ import annotations

import csv
import json
import os
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["DatasetInfo", "read_csv_raw", "read_ob_csv", "read_ob_vw",
           "read_ob_raw_dump", "parse_namespace_file", "read_dataset"]


@dataclass
class DatasetInfo:
    df: DataFrame
    column_names: list[str]
    numeric_columns: set[str] = field(default_factory=set)
    fw_map: dict[str, str] | None = None


def read_csv_raw(spark: SparkSession, data_path: str) -> DatasetInfo:
    """Header-row CSV folder (core_utils.py:389-400)."""
    path = os.path.join(data_path, "data.csv")
    df = (
        spark.read.option("header", True)
        .option("encoding", "iso-8859-1")
        .option("quote", '"')
        .csv(path)
    )
    return DatasetInfo(df=df, column_names=list(df.columns))


def read_ob_csv(spark: SparkSession, data_path: str) -> DatasetInfo:
    """CSV + dataset_desc.json typed descriptor (core_utils.py:369-386)."""
    with open(os.path.join(data_path, "dataset_desc.json")) as f:
        desc = json.load(f)
    column_names, numeric = [], set()
    for feature in desc.get("data_features", []):
        name = feature.get("name")
        column_names.append(name)
        if "float" in feature.get("type", "").lower():
            numeric.add(name)
    df = (
        spark.read.option("header", True)
        .option("encoding", "iso-8859-1")
        .csv(os.path.join(data_path, "data.csv"))
    )
    return DatasetInfo(df=df, column_names=column_names,
                       numeric_columns=numeric)


def parse_namespace_file(namespace_path: str) -> tuple[set[str], dict[str, str]]:
    """vw_namespace_map.csv -> (float feature set, fw_id -> feature)
    (core_utils.py:245-268 semantics, incl. the no-underscore 2-part
    rule and silently skipped malformed lines)."""
    float_set: set[str] = set()
    id_feature_map: dict[str, str] = {}
    with open(namespace_path) as nm:
        for line in nm:
            try:
                parts = line.strip().split(",")
                if len(parts) == 2 and "_" not in parts[0]:
                    fw_id, feature = parts
                    type_name = "generic"
                elif len(parts) == 3:
                    fw_id, feature, type_name = parts
                else:
                    continue
                id_feature_map[fw_id] = feature
                if type_name == "f32":
                    float_set.add(feature)
            except Exception:
                pass
    return float_set, id_feature_map


def read_ob_vw(spark: SparkSession, data_path: str,
               include_namespace_info: bool = False) -> DatasetInfo:
    """Sparse VW lines -> dense named string columns."""
    float_set, fw_map = parse_namespace_file(
        os.path.join(data_path, "vw_namespace_map.csv"),
    )
    column_names = ["label"] + list(fw_map.values())

    candidates = [
        os.path.join(data_path, n)
        for n in ("data.vw.gz", "data.vw", "data.vw.zst")
    ]
    data_file = next((c for c in candidates if os.path.exists(c)), None)
    if data_file is None:
        raise NotImplementedError(
            "Please provide data.vw[.gz] — .zst needs a codec jar",
        )
    if data_file.endswith(".zst"):
        raise NotImplementedError(
            "zstd line streams need the hadoop zstd codec (unavailable); "
            "re-compress as .gz",
        )

    lines = spark.read.text(data_file)
    schema = ", ".join(f"`{c}` string" for c in column_names)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf["value"].astype(str).str.strip()
            groups = s.str.split("|")
            label = groups.str[0].str.split(" ").str[0]
            out = {"label": label}
            # namespace -> joined values per row (vectorized per column)
            maps = groups.map(_row_namespace_map)
            for col in column_names[1:]:
                vals = maps.map(lambda m, c=col: m.get(c))
                if not include_namespace_info:
                    vals = vals.map(
                        lambda v: v[2:] if isinstance(v, str) else None,
                    )
                out[col] = vals
            yield pd.DataFrame(out)

    def _row_namespace_map(parts: list[str]) -> dict[str, str]:
        m = {}
        for grp in parts[1:]:
            core = grp.strip().split(" ")
            ns = core[0]
            feature = fw_map.get(ns)
            if feature is not None:
                m[feature] = "-".join(x for x in core[1:] if x != "")
        return m

    df = lines.mapInPandas(parse, schema=schema)
    return DatasetInfo(df=df, column_names=column_names,
                       numeric_columns=float_set, fw_map=fw_map)


def read_ob_raw_dump(spark: SparkSession, data_path: str) -> DatasetInfo:
    """TSV shard glob + tab-separated header file (core_utils.py:311-346).
    Spark reads the shard glob natively — no concat/re-dump step."""
    header_path = os.path.join(data_path, "raw_data", "0_header", "header.csv")
    with open(header_path, encoding="utf-8") as f:
        column_names = f.read().strip().split("\t")
    df = (
        spark.read.option("sep", "\t")
        .csv(os.path.join(data_path, "raw_data", "1_train", "*"))
        .toDF(*column_names)
    )
    return DatasetInfo(df=df, column_names=column_names)


_READERS = {
    "csv-raw": read_csv_raw,
    "ob-csv": read_ob_csv,
    "ob-vw": read_ob_vw,
    "ob-raw-dump": read_ob_raw_dump,
}


def read_dataset(spark: SparkSession, data_path: str,
                 data_source: str) -> DatasetInfo:
    if data_source not in _READERS:
        raise ValueError(
            f"unknown data source {data_source!r}; one of {sorted(_READERS)}",
        )
    return _READERS[data_source](spark, data_path)

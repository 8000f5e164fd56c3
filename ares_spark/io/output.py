"""Result output formats (SURVEY.md A29) — the CLI surface of the
reference (/root/reference/crates/ares-cli/src/output.rs:6-11): json,
jsonl, csv, table. Thin wrappers over Spark-native writers/renderers so
formatting never pulls rows to the driver except for `table`/`json`
(explicitly driver-side, small-result surfaces).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def to_json(df: DataFrame, limit: int = 1000) -> str:
    """Pretty JSON array (driver-side; cap rows explicitly)."""
    rows = [json.loads(r) for r in df.limit(limit).toJSON().collect()]
    return json.dumps(rows, indent=2, ensure_ascii=False)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines, distributed write."""
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with header, distributed write. Array/struct columns are
    JSON-encoded first (CSV has no nested types)."""
    from pyspark.sql import functions as F

    out = df
    for f in df.schema.fields:
        if f.dataType.typeName() in ("array", "struct", "map"):
            out = out.withColumn(f.name, F.to_json(f.name))
    out.write.mode(mode).option("header", True).csv(path)


def to_table(df: DataFrame, n: int = 20, truncate: int = 40) -> str:
    """Fixed-width table string (the reference's `table` format)."""
    return df._show_string(n, truncate, False)

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


def _jq_apply(value, part: str):
    """One pipeline segment of the jq path subset: '.', '.foo.bar',
    '.[]', '.foo[]', '.[2]' — identity, object field walks, array
    iteration, array index. Missing fields/indexes yield null (jq's
    behavior); iterating a non-array yields nothing."""
    import re

    part = part.strip()
    if part == ".":
        return [value]
    if not part.startswith("."):
        raise ValueError(f"unsupported jq expression segment: {part!r}")
    toks = re.findall(r"\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d*)\]", part)
    if not toks:
        raise ValueError(f"unsupported jq expression segment: {part!r}")
    cur = [value]
    for name, idx in toks:
        nxt = []
        for c in cur:
            if name:
                nxt.append(c.get(name) if isinstance(c, dict) else None)
            elif idx == "":
                if isinstance(c, list):
                    nxt.extend(c)
            else:
                i = int(idx)
                nxt.append(c[i] if isinstance(c, list) and i < len(c) else None)
        cur = nxt
    return cur


def to_jq(df: DataFrame, expr: str = ".", limit: int = 1000) -> str:
    """The reference's fifth output format (output.rs:6-11 OutputFormat::Jq):
    COMPACT single-line JSON — `serde_json::to_string` vs json's
    to_string_pretty — i.e. jq-pipeable output. ``expr`` additionally
    supports a small jq path subset ('.', '.[]', '.field.sub', '.[2]',
    stages joined with '|'), evaluated driver-side over the same rows
    to_json renders; each resulting value prints as one compact line,
    exactly like the jq CLI."""
    rows = [json.loads(r) for r in df.limit(limit).toJSON().collect()]
    vals = [rows]
    for part in expr.split("|"):
        vals = [v for cur in vals for v in _jq_apply(cur, part)]
    return "\n".join(
        json.dumps(v, separators=(",", ":"), ensure_ascii=False) for v in vals
    )

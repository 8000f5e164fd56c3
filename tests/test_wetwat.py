"""WET/WAT sources: spec-pinned parsing, distributed reads, and the
bridges into the training-data ops (WET) and the frontier feed (WAT)."""

import gzip

from pyspark.sql import functions as F


def test_wet_parse_handcrafted_bytes(tmp_path):
    """Reader pinned against WET bytes built by hand from ISO 28500 —
    not via write_wet — warcinfo skipped, conversion text decoded."""
    from ares_spark.io.wetwat import read_wet

    text = "hand built wet text"
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: conversion\r\n"
           b"WARC-Target-URI: https://h.example.org/x\r\n"
           b"WARC-Date: 2026-03-01T12:00:00Z\r\n"
           b"Content-Type: text/plain\r\n"
           b"Content-Length: " + str(len(text)).encode() + b"\r\n\r\n"
           + text.encode() + b"\r\n\r\n")
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 2\r\n\r\nxx\r\n\r\n")
    (tmp_path / "hand.wet.gz").write_bytes(gzip.compress(info) + gzip.compress(rec))
    import sys

    sys.modules.pop("_probe", None)
    # parse without Spark via the shared framing iterator
    from ares_spark.io.warc import _open_stream, iter_warc_records

    with _open_stream(str(tmp_path / "hand.wet.gz")) as s:
        got = [(h.get("warc-type"), p) for h, p in iter_warc_records(s)]
    assert got[1] == ("conversion", text.encode())


def test_wet_roundtrip_and_documents_bridge(spark, tmp_path):
    from ares_spark.io.wetwat import read_wet, wet_documents, write_wet

    write_wet(str(tmp_path / "a.wet.gz"), [
        {"url": f"https://w.example.org/p{i}", "date": "2026-03-01T00:00:00Z",
         "text": f"document {i} body text with words " * (i + 1)}
        for i in range(5)
    ])
    write_wet(str(tmp_path / "b.wet.gz"), [
        {"url": "https://w.example.org/uni", "date": "2026-03-01T00:00:00Z",
         "text": "héllo wörld 😀"},
    ])
    df = read_wet(spark, str(tmp_path)).cache()
    assert df.count() == 6
    assert df.filter(F.col("text").contains("😀")).count() == 1
    docs = wet_documents(spark, str(tmp_path))
    # doc_id is deterministic + unique per url
    assert docs.select("doc_id").distinct().count() == 6
    a = {r.url: r.doc_id for r in docs.collect()}
    b = {r.url: r.doc_id for r in wet_documents(spark, str(tmp_path)).collect()}
    assert a == b


def test_wet_feeds_training_ops(spark, tmp_path):
    """The WET bridge IS the engine input: token counting, quality
    scoring and language ID run straight over wet_documents output."""
    from ares_spark.functions.text import lang_id, quality_score, token_count
    from ares_spark.io.wetwat import wet_documents, write_wet

    write_wet(str(tmp_path / "c.wet.gz"), [
        {"url": "https://w.example.org/en", "date": "2026-03-01T00:00:00Z",
         "text": "The quick brown fox jumps over the lazy dog and runs away."},
        {"url": "https://w.example.org/de", "date": "2026-03-01T00:00:00Z",
         "text": "Der schnelle braune Fuchs springt über den faulen Hund und läuft weg."},
    ])
    out = wet_documents(spark, str(tmp_path)).select(
        "url",
        token_count(F.col("text")).alias("n_toks"),
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lang"),
    ).collect()
    got = {r.url.rsplit("/", 1)[1]: (r.n_toks, r.lang) for r in out}
    assert got["en"][0] == 12 and got["en"][1] == "en"
    assert got["de"][1] == "de"


def test_wat_links_roundtrip_and_jvm_only_extraction(spark, tmp_path):
    """Outlink extraction: values match the construction-known graph and
    the plan's ONLY Python stage is the record reader — the JSON walk is
    get_json_object/from_json/explode, all JVM-side."""
    from ares_spark.io.wetwat import wat_links, wat_titles, write_wat

    write_wat(str(tmp_path / "x.wat.gz"), [
        {"url": "https://s.example.org/a", "date": "2026-03-01T00:00:00Z",
         "links": ["https://s.example.org/b", "https://t.example.org/c"],
         "title": "A"},
        {"url": "https://s.example.org/b", "date": "2026-03-01T00:00:00Z",
         "links": [], "title": None},
    ])
    links = wat_links(spark, str(tmp_path))
    got = sorted((r.src_url, r.link_url) for r in links.collect())
    assert got == [("https://s.example.org/a", "https://s.example.org/b"),
                   ("https://s.example.org/a", "https://t.example.org/c")]
    plan = links._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints the plan twice
    assert plan.count("MapInPandas") == 1  # the reader, nothing else
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    titles = {r.url: r.title for r in wat_titles(spark, str(tmp_path)).collect()}
    assert titles == {"https://s.example.org/a": "A", "https://s.example.org/b": None}

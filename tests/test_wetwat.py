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


def test_wet_dataset_sink_roundtrip(spark, tmp_path):
    """Distributed WET sink: the engine's output read back by its own
    reader — urls, timestamps and text byte-identical; idempotent
    partition-deterministic file names."""
    from ares_spark.io.wetwat import read_wet, write_wet_dataset

    df = spark.createDataFrame(
        [(f"https://o.example.org/p{i}", "2026-03-01 00:00:00",
          f"text body {i} " * 3) for i in range(40)],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).repartition(4)
    out = tmp_path / "wet_out"
    n = write_wet_dataset(df, str(out))
    assert n == 40
    files = sorted(p.name for p in out.glob("part-*.wet.gz"))
    assert len(files) == 4 and files[0].startswith("part-000")
    back = read_wet(spark, str(out))
    got = sorted((r.url, r.text) for r in back.collect())
    want = sorted((r.url, r.text) for r in df.collect())
    assert got == want
    assert back.filter("warc_ts is null").count() == 0


def test_wet_sink_null_timestamp_row_survives(spark, tmp_path):
    """r5 ADVICE fix: a null warc_ts arrives in the mapInPandas task as
    pandas NaT (not None); the sink must treat it as missing (record
    written WITHOUT a WARC-Date header), not crash the write task."""
    from ares_spark.io.wetwat import read_wet, write_wet_dataset

    df = spark.createDataFrame(
        [("https://o.example.org/dated", "2026-03-01 00:00:00", "body a"),
         ("https://o.example.org/undated", None, "body b")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).coalesce(1)
    out = tmp_path / "wet_nat"
    assert write_wet_dataset(df, str(out)) == 2
    back = {r.url: (r.warc_ts, r.text) for r in read_wet(spark, str(out)).collect()}
    assert back["https://o.example.org/undated"][0] is None
    assert back["https://o.example.org/undated"][1] == "body b"
    assert back["https://o.example.org/dated"][0] is not None


def test_wet_sink_nonutc_session_tz_writes_true_utc(spark, tmp_path):
    """r5 ADVICE fix: Arrow hands tasks naive session-local timestamps;
    the sink must localize to the session tz and convert to UTC before
    stamping the 'Z'-suffixed WARC-Date, so a non-UTC session does not
    shift every date. read_wet's tz-aware parse round-trips the value."""
    import gzip as _gz

    from ares_spark.io.wetwat import write_wet_dataset

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("https://o.example.org/tz", "2026-03-01 12:00:00", "tz body")],
            "url string, warc_ts string, text string",
        ).withColumn("warc_ts", F.to_timestamp("warc_ts")).coalesce(1)
        out = tmp_path / "wet_tz"
        assert write_wet_dataset(df, str(out)) == 1
        raw = _gz.decompress((out / "part-00000.wet.gz").read_bytes()).decode()
        # noon New York (EST, -05:00) == 17:00 UTC
        assert "WARC-Date: 2026-03-01T17:00:00Z" in raw
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_crawl_seeded_from_wat_link_graph(spark, tmp_path):
    """WAT → frontier: a crawl seeded distributively from a WAT link
    graph (seed_df path, no driver-side url list) visits the same pages
    in the same order as the list-seeded crawl."""
    from ares_spark.crawl import CrawlConfig, run_crawl
    from ares_spark.crawl.checkpoint import SnapshotStore
    from ares_spark.io.synth import CRAWL_SEED_URL, crawl_site_pages
    from ares_spark.io.wetwat import wat_links, write_wat

    write_wat(str(tmp_path / "seed.wat.gz"), [
        {"url": "https://hub.example.net/", "date": "2026-03-01T00:00:00Z",
         "links": [CRAWL_SEED_URL], "title": "Hub"},
    ])
    site = crawl_site_pages(spark)
    cfg = CrawlConfig(schema_spec="blog@latest", max_depth=1,
                      use_bloom=False, max_generations=10)

    def visits(ck):
        store = SnapshotStore(ck)
        return sorted(
            (r.visit_pos, r.url, r.outcome)
            for r in store.read_all_batches(spark, "visits").collect()
        )

    ck_list = str(tmp_path / "ck_list")
    run_crawl(spark, site, [CRAWL_SEED_URL], ck_list, cfg, session_id="s1")
    ck_wat = str(tmp_path / "ck_wat")
    seeds = wat_links(spark, str(tmp_path)).select(F.col("link_url").alias("url"))
    run_crawl(spark, site, [], ck_wat, cfg, session_id="s1", seed_df=seeds)
    assert visits(ck_list) == visits(ck_wat)


def test_seed_frontier_from_df_deterministic_and_schema(spark):
    from ares_spark.crawl.frontier import FRONTIER_SCHEMA
    from ares_spark.crawl.loop import CrawlConfig, seed_frontier_from_df

    cfg = CrawlConfig(allowed_domains=["example.org"])
    urls = spark.createDataFrame(
        [(f"HTTPS://Site{i % 7}.example.org:443/p/../q{i}",) for i in range(50)]
        + [("https://site0.example.org/q0",)],  # dup after canonicalization? no — q0 differs
        "url string",
    )
    a = seed_frontier_from_df(urls.repartition(13), cfg, "sess")
    b = seed_frontier_from_df(urls.repartition(2), cfg, "sess")
    rows_a = sorted((r.url, r.created_seq, r.job_id) for r in a.collect())
    rows_b = sorted((r.url, r.created_seq, r.job_id) for r in b.collect())
    assert rows_a == rows_b  # partition-invariant seq + ids
    assert [f.name for f in a.schema.fields] == [f.name for f in FRONTIER_SCHEMA.fields]
    one = a.first()
    assert one.url.startswith("https://site") and ":443" not in one.url
    assert one.allowed_domains == ["example.org"] and one.status == "pending"
    seqs = sorted(r.created_seq for r in a.collect())
    assert seqs == list(range(len(seqs)))  # dense 0-based

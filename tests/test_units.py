"""Unit tests: robots matcher, Bloom/cuckoo filters, breaker, schema
registry, validation, groundedness (reference-test-semantics ports)."""

import numpy as np
import pytest

from ares_spark.crawl.breaker import CircuitBreaker
from ares_spark.crawl.robots import RobotsMatcher
from ares_spark.crawl.seen import BloomFilter, CuckooFilter
from ares_spark.operators.groundedness import ungrounded_fields
from ares_spark.operators.validate import validate_extracted_output, validate_schema
from ares_spark.schemas import SchemaRegistry, compare_versions

# ---- robots (RFC 9309 / google-matcher semantics, robots.rs:36-89) -----------


def test_robots_basic_disallow():
    m = RobotsMatcher.parse("User-agent: *\nDisallow: /private/\n")
    assert not m.is_allowed("https://x.com/private/a")
    assert m.is_allowed("https://x.com/public")


def test_robots_longest_match_wins():
    m = RobotsMatcher.parse("User-agent: *\nDisallow: /a/\nAllow: /a/b/\n")
    assert not m.is_allowed("https://x.com/a/x")
    assert m.is_allowed("https://x.com/a/b/c")


def test_robots_tie_allows():
    m = RobotsMatcher.parse("User-agent: *\nDisallow: /p\nAllow: /p\n")
    assert m.is_allowed("https://x.com/p")


def test_robots_wildcards_and_anchor():
    m = RobotsMatcher.parse("User-agent: *\nDisallow: /*.pdf$\n")
    assert not m.is_allowed("https://x.com/doc.pdf")
    assert m.is_allowed("https://x.com/doc.pdfx")


def test_robots_agent_specific_group():
    txt = "User-agent: aresbot\nDisallow: /\n\nUser-agent: *\nDisallow:\n"
    m = RobotsMatcher.parse(txt)
    assert not m.is_allowed("https://x.com/a", user_agent="AresBot/1.0")
    assert m.is_allowed("https://x.com/a", user_agent="other")


def test_robots_missing_allows_all():
    m = RobotsMatcher.parse(None)
    assert m.is_allowed("https://x.com/anything")


def test_robots_crawl_delay():
    m = RobotsMatcher.parse("User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert m.crawl_delay() == 2.5


def test_robots_empty_disallow_matches_nothing():
    m = RobotsMatcher.parse("User-agent: *\nDisallow:\n")
    assert m.is_allowed("https://x.com/a")


# ---- Bloom ---------------------------------------------------------------------


def test_bloom_no_false_negatives():
    bf = BloomFilter.sized(10_000, fpp=0.01)
    keys = np.arange(-5000, 5000, dtype=np.int64) * 2654435761
    bf.add(keys)
    assert bf.might_contain(keys).all()


def test_bloom_fpp_reasonable():
    bf = BloomFilter.sized(10_000, fpp=0.01)
    rng = np.random.default_rng(42)
    present = rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    bf.add(present)
    absent = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    fpp = bf.might_contain(absent).mean()
    assert fpp < 0.03, fpp


def test_bloom_roundtrip_bytes():
    bf = BloomFilter.sized(100)
    bf.add(np.array([1, 2, 3], dtype=np.int64))
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.might_contain(np.array([1, 2, 3], dtype=np.int64)).all()
    assert not bf2.might_contain(np.array([999], dtype=np.int64)).any()


# ---- cuckoo (deletion-capable fallback) ------------------------------------------


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(capacity=4096)
    keys = [k * 0x9E3779B9 for k in range(1000)]
    for k in keys:
        assert cf.add(k)
    assert all(cf.contains(k) for k in keys)
    for k in keys[:500]:
        assert cf.delete(k)
    misses = sum(cf.contains(k) for k in keys[:500])
    assert misses < 25  # deleted; residual = fingerprint collisions only
    assert all(cf.contains(k) for k in keys[500:])


# ---- breaker (circuit_breaker.rs:43-72 semantics at batch granularity) -----------


def test_breaker_opens_after_threshold():
    cb = CircuitBreaker()
    for g in range(5):
        cb.record("h", successes=0, failures=1, generation=g)
    assert cb.claim_budget("h", 5) == 0  # open
    assert cb.claim_budget("h", 7) == cb.half_open_probe_budget  # half-open after recovery


def test_breaker_halfopen_closes_on_successes():
    cb = CircuitBreaker()
    cb.record("h", 0, 5, 0)
    assert cb.claim_budget("h", 1) == 0
    assert cb.claim_budget("h", 3) == 2  # half-open probe
    cb.record("h", 2, 0, 3)
    assert cb.claim_budget("h", 4) is None  # closed again


def test_breaker_halfopen_failure_doubles_recovery():
    cb = CircuitBreaker()
    cb.record("h", 0, 5, 0)
    cb.claim_budget("h", 3)  # → half-open
    cb.record("h", 0, 1, 3)  # probe fails → reopen, recovery doubled
    assert cb.hosts["h"].state == "open"
    assert cb.hosts["h"].recovery_gens == 2


def test_breaker_roundtrip():
    cb = CircuitBreaker()
    cb.record("h", 0, 5, 0)
    cb2 = CircuitBreaker.from_dict(cb.to_dict())
    assert cb2.hosts["h"].state == "open"


# ---- schema registry (schema.rs:105-206, 413-438) ---------------------------------


def test_registry_latest_and_pinned():
    reg = SchemaRegistry()
    name, ver, schema = reg.resolve("blog@latest")
    assert (name, ver) == ("blog", "1.0.0")
    assert "title" in schema["properties"]
    assert reg.resolve("blog") == reg.resolve("blog@1.0.0")


def test_registry_missing_raises():
    with pytest.raises(FileNotFoundError):
        SchemaRegistry().resolve("nope@latest")


def test_version_compare_semantic():
    assert compare_versions("1.10.0", "1.2.0") > 0  # schema.rs:413-433
    assert compare_versions("1.0.0", "1.0.0") == 0
    assert compare_versions("0.9.9", "1.0.0") < 0


# ---- validation (schema.rs:37-68) ---------------------------------------------------


def test_validation_gates_missing_required():
    schema = {"type": "object", "properties": {"a": {"type": "string"}}, "required": ["a"]}
    assert validate_extracted_output(schema, {}) != []
    assert validate_extracted_output(schema, {"a": "x"}) == []


def test_validation_type_mismatch_and_cap():
    schema = {
        "type": "object",
        "properties": {f"f{i}": {"type": "integer"} for i in range(20)},
        "required": [f"f{i}" for i in range(20)],
    }
    errs = validate_extracted_output(schema, {})
    assert len(errs) == 10  # capped (schema.rs:58)
    assert validate_extracted_output(
        {"type": "object", "properties": {"n": {"type": "integer"}}}, {"n": "NaN"}
    ) != []
    # bool is not an integer (JSON Schema semantics)
    assert validate_extracted_output(
        {"type": "object", "properties": {"n": {"type": "integer"}}}, {"n": True}
    ) != []


def test_meta_validation():
    assert validate_schema({"type": "object"}) == []
    assert validate_schema([1, 2]) != []
    assert validate_schema({"type": "object", "required": "nope"}) != []


# ---- groundedness (groundedness.rs:100-171 semantics) --------------------------------

SOURCE = (
    "## Page metadata\n"
    "- URL: https://blog.example.com/posts/rethinking-backpressure-async-rust\n"
    "- Author: Mara Vinçek\n"
    "- Published: 2026-05-14\n\n"
    "Rethinking Backpressure in Async Rust. A post about bounded channels."
)


def test_grounded_exact_substring():
    assert ungrounded_fields(SOURCE, {"author": "Mara Vinçek"}) == []


def test_grounded_reformatted_date_by_tokens():
    # token-cover rule: '2026' and the digits survive reformat
    assert ungrounded_fields(SOURCE, {"d": "2026-05-14"}) == []


def test_ungrounded_fabricated_url():
    out = ungrounded_fields(SOURCE, {"u": "https://evil.example.net/made-up"})
    assert out == ["u"]


def test_long_prose_skipped():
    prose = " ".join(["word"] * 20)  # > MAX_ATOMIC_WORDS → skipped
    assert ungrounded_fields(SOURCE, {"summary": prose}) == []


def test_nested_paths():
    out = ungrounded_fields(SOURCE, {"a": {"b": ["Mara Vinçek", "Fabricated Name Xyz"]}})
    assert out == ["a.b[1]"]


def test_case_insensitive():
    assert ungrounded_fields(SOURCE, {"t": "BOUNDED CHANNELS"}) == []


def test_registry_all_reference_names_resolve():
    """Registry parity: every schema name the reference ships resolves."""
    reg = SchemaRegistry()
    for name in ["blog", "github_repo", "product", "news_article",
                 "job_listing", "recipe", "event", "dataset",
                 "public_tenders", "tender_list", "job_board"]:
        n, v, schema = reg.resolve(f"{name}@latest")
        assert n == name and schema["type"] == "object", name


def test_registry_crud_lifecycle(tmp_path):
    """A26 (schema.rs:261-407): create / update / delete with latest
    fallback on delete."""
    reg = SchemaRegistry(tmp_path)
    doc = {"type": "object", "properties": {"a": {"type": "string"}}, "required": ["a"]}
    reg.create("thing", "1.0.0", doc)
    reg.create("thing", "1.2.0", doc)
    reg.create("thing", "1.10.0", doc)  # semantic: newest
    assert reg.resolve("thing@latest")[1] == "1.10.0"
    # re-create refused; update works
    with pytest.raises(FileExistsError):
        reg.create("thing", "1.2.0", doc)
    doc2 = {**doc, "properties": {"b": {"type": "integer"}}}
    reg.update("thing", "1.2.0", doc2)
    assert "b" in reg.resolve("thing@1.2.0")[2]["properties"]
    # deleting the latest falls back to the highest remaining version
    reg.delete("thing", "1.10.0")
    assert reg.resolve("thing@latest")[1] == "1.2.0"
    # and the fallback survives a fresh registry load
    assert SchemaRegistry(tmp_path).resolve("thing")[1] == "1.2.0"
    reg.delete("thing", "1.2.0")
    reg.delete("thing", "1.0.0")
    with pytest.raises(FileNotFoundError):
        SchemaRegistry(tmp_path).resolve("thing@latest")
    # invalid documents rejected at create
    with pytest.raises(ValueError):
        reg.create("bad", "1.0.0", {"type": "object", "required": "nope"})


def test_array_of_objects_extraction():
    """Listing-page shape (job_board/tender_list): one object per list
    item with link text/href and 'key: value' tails mapped to fields."""
    from ares_spark.html import clean_html
    from ares_spark.operators.extract import extract_structured

    html = (
        '<html><head><title>Careers</title>'
        '<link rel="canonical" href="https://a.example.com/careers"></head>'
        "<body><h2>Jobs</h2><ul>"
        '<li><a href="/jobs/1">Platform Engineer</a> — Department: Infra · Location: Remote</li>'
        '<li><a href="/jobs/2">Designer</a></li>'
        "</ul></body></html>"
    )
    reg = SchemaRegistry()
    _, _, schema = reg.resolve("job_board")
    val = extract_structured(clean_html(html), schema)
    assert validate_extracted_output(schema, val) == []
    assert val["jobs"][0] == {
        "title": "Platform Engineer", "department": "Infra",
        "location": "Remote", "url": "/jobs/1",
    }
    assert val["jobs"][1] == {"title": "Designer", "url": "/jobs/2"}
    # empty page → jobs: [] (still schema-shaped)
    assert extract_structured("nothing here", schema) == {"jobs": []}


# ---- synthesized extraction fixtures (the 5 reference-fixture-less schemas) ----


import json as _json
from pathlib import Path as _Path

_SYNTH_FIXTURES = ["dataset", "event", "job_listing", "job_board", "tender_list"]


@pytest.mark.parametrize("name", _SYNTH_FIXTURES)
def test_synth_fixture_extraction_golden(name):
    """Every registry schema now has a fixture: extraction is valid, fully
    grounded, and byte-pinned against tests/golden/extractions.json."""
    from ares_spark.html import process_html
    from ares_spark.operators.extract import canonical_json, extract_structured
    from ares_spark.operators.groundedness import ungrounded_fields
    from ares_spark.operators.validate import validate_extracted_output

    root = _Path(__file__).parent
    html = (root / "fixtures" / f"{name}.html").read_text()
    text, _ = process_html(html, f"https://fixtures.example.org/{name}", 500_000)
    _, _, schema = SchemaRegistry().resolve(name)
    value = extract_structured(text, schema)
    assert validate_extracted_output(schema, value) == []
    assert ungrounded_fields(text, value) == []
    golden = _json.loads((root / "golden" / "extractions.json").read_text())
    assert canonical_json(value) == golden[name]


def test_xxh64_twin_matches_spark(spark):
    """tools/xxh64.py (the independent golden-generator hash) must equal
    F.xxhash64 on every column-type path it uses: int, long, short/mid/
    long strings (all three xxHash length regimes), and multi-column
    seed chaining."""
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from xxh64 import spark_xxhash64

    cases = [
        [("i", 0)], [("i", 7)], [("i", -3)], [("l", 0)], [("l", -9)],
        [("l", 123456789012345)], [("s", "")], [("s", "hello")],
        [("s", "é中😀")], [("s", "x" * 31)], [("s", "y" * 32)],
        [("s", "z" * 100)], [("i", 3), ("s", "abc def")],
        [("i", 0), ("l", 42), ("s", "mixed")],
        [("i", 2), ("l", -1), ("l", 5), ("l", 9), ("l", 13)],
    ]
    exprs = []
    for i, case in enumerate(cases):
        cols = [F.lit(v).cast({"i": "int", "l": "long"}.get(t, "string"))
                for t, v in case]
        exprs.append(F.xxhash64(*cols).alias(f"c{i}"))
    got = spark.range(1).select(*exprs).first()
    for i, case in enumerate(cases):
        args = [("long", v) if t == "l" else v for t, v in case]
        assert spark_xxhash64(*args) == got[f"c{i}"], case


def test_registry_crud_on_default_root_is_isolated():
    """CRUD against a default-constructed registry must copy-on-write to a
    per-process dir — never mutate the shared packaged defs tree (or the
    spark-submit zip-extraction cache reused across runs)."""
    reg = SchemaRegistry()
    shared = reg.root
    doc = {"type": "object", "properties": {"a": {"type": "string"}},
           "required": ["a"]}
    reg.create("cow_thing", "1.0.0", doc)
    assert reg.root != shared  # switched to a private copy
    assert reg.resolve("cow_thing@latest")[1] == "1.0.0"
    assert reg.resolve("blog")[0] == "blog"  # packaged defs still visible
    assert not (shared / "cow_thing").exists()  # shared tree untouched
    assert "cow_thing" not in SchemaRegistry()._latest  # no cross-run leak
    import shutil

    shutil.rmtree(reg.root)

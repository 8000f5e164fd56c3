"""Property-based robustness: at 10^10 URLs every weird input WILL occur.

hypothesis drives the pure-Python layers (they run inside pandas UDFs, so
an exception here is a dead Arrow batch at scale): the cleaner must never
raise and must be deterministic; URL canonicalization must be idempotent;
the Bloom filter can never false-negative; jaccard/minhash invariants.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ares_spark.crawl.robots import RobotsMatcher
from ares_spark.crawl.seen import BloomFilter, CuckooFilter
from ares_spark.functions.urls import canonicalize_url, resolve_url, url_host
from ares_spark.html import clean_html, discover_links
from ares_spark.operators.groundedness import ungrounded_fields

_settings = settings(max_examples=150, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


@given(st.text(max_size=2000))
@_settings
def test_clean_html_total_and_deterministic(html):
    out1 = clean_html(html)
    out2 = clean_html(html)
    assert isinstance(out1, str) and out1 == out2


@given(st.binary(max_size=2000))
@_settings
def test_clean_html_survives_binary_soup(raw):
    clean_html(raw.decode("latin1"))


@given(st.text(max_size=500), st.text(max_size=100))
@_settings
def test_discover_links_total(html, base):
    links = discover_links(html, base)
    assert isinstance(links, list)
    assert links == sorted(set(links))  # always sorted+deduped


@given(st.text(max_size=200))
@_settings
def test_canonicalize_idempotent(url):
    c = canonicalize_url(url)
    if c is not None:
        assert canonicalize_url(c) == c
        assert c.startswith(("http://", "https://"))
        assert url_host(c)


@given(st.text(max_size=100), st.text(max_size=100))
@_settings
def test_resolve_total(base, href):
    r = resolve_url(base, href)
    assert r is None or r.startswith(("http://", "https://"))


@given(st.text(max_size=1000), st.text(max_size=200))
@_settings
def test_robots_total(content, url):
    m = RobotsMatcher.parse(content)
    assert m.is_allowed(url) in (True, False)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=500, unique=True))
@_settings
def test_bloom_never_false_negative(keys):
    bf = BloomFilter.sized(len(keys))
    arr = np.array(keys, dtype=np.int64)
    bf.add(arr)
    assert bf.might_contain(arr).all()


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=200, unique=True))
@_settings
def test_cuckoo_contains_after_add(keys):
    cf = CuckooFilter(capacity=max(len(keys) * 4, 64))
    added = [k for k in keys if cf.add(k)]
    assert all(cf.contains(k) for k in added)


@given(st.text(max_size=500),
       st.dictionaries(st.text(min_size=1, max_size=10),
                       st.text(max_size=50), max_size=5))
@_settings
def test_groundedness_total(source, value):
    paths = ungrounded_fields(source, value)
    assert all(isinstance(p, str) for p in paths)
    # values that are substrings of the source are never flagged
    for k, v in value.items():
        if v and v.strip() and v.lower().strip() in source.lower():
            assert k not in paths

"""Live HTTP fetch stage — A1's real-crawl half (fetcher.rs:149-186).

The sandbox default substitutes ``frontier ⋈ pages`` for the network
(SURVEY A1); this module is the flagged live path: a ``mapInPandas``
fetcher that issues real GETs with the reference's User-Agent
(fetcher.rs:123 "Ares/0.2 (AI Scraper)"), a hard per-request timeout
(fetcher.rs:150-166: timeout / connect / http errors mapped to distinct
messages), per-host pacing (throttle.rs min-interval semantics, enforced
task-locally), and the SSRF guard re-validated immediately before each
request (fetcher.rs:151-153 validate_url) — the batch frontier filter is
a pre-filter; the fetch layer is the authoritative gate.

Scale shape: rows are repartitioned BY HOST before the UDF so exactly one
task owns any host's requests — politeness needs no cross-executor
coordination, and a slow host stalls only its own task while other hosts
proceed. The fetcher adds ``(html, fetch_status, fetched_at,
fetch_error)`` and leaves every input column intact, so the crawl loop's
downstream machinery (retry/backoff on html IS NULL, breaker feed, visit
outcomes) treats a live failure exactly like a missing pages-table row.

An explicit ``proxy`` (host:port) routes requests through a standard
absolute-form HTTP proxy — the reference supports proxies natively
(fetcher.rs:117-146 build_client) and it is how the test suite exercises
this stage against a loopback server with zero external network.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_UA = "Ares/0.2 (AI Scraper)"  # fetcher.rs:123

FETCH_FIELDS = [
    T.StructField("html", T.BinaryType(), True),
    T.StructField("fetch_status", T.IntegerType(), True),
    T.StructField("fetched_at", T.DoubleType(), True),
    T.StructField("fetch_error", T.StringType(), True),
]


def _fetch_one(opener, url: str, timeout_s: float, user_agent: str):
    """One GET → (body_bytes|None, status|None, error|None). Error strings
    mirror the reference's AppError variants (fetcher.rs:150-186)."""
    import socket
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            body = resp.read()
            return body, int(resp.status), None
    except urllib.error.HTTPError as e:
        # non-2xx: reference returns HttpError("HTTP {code} for {url}")
        return None, int(e.code), f"HTTP {e.code} for {url}"
    except (socket.timeout, TimeoutError):
        return None, None, f"Request timed out after {timeout_s:g}s"
    except urllib.error.URLError as e:
        reason = getattr(e, "reason", e)
        if isinstance(reason, (socket.timeout, TimeoutError)):
            return None, None, f"Request timed out after {timeout_s:g}s"
        return None, None, f"Connection failed: {reason}"
    except Exception as e:  # defensive: a fetch error must never kill the task
        return None, None, f"http error: {e}"


def live_fetch(
    batch: DataFrame,
    *,
    timeout_s: float = 30.0,
    proxy: str | None = None,
    per_host_delay_s: float = 0.0,
    ssrf: bool = True,
    resolver=None,
    user_agent: str = DEFAULT_UA,
    n_partitions: int | None = None,
    order_col: str = "claim_pos",
) -> DataFrame:
    """Fetch every row of ``batch`` (must carry ``url`` and ``host``
    columns) over real HTTP. Returns ``batch``'s columns plus
    ``html`` (binary, NULL on any failure), ``fetch_status`` (HTTP code,
    NULL when no response arrived), ``fetched_at`` (unix seconds) and
    ``fetch_error`` (NULL on success).

    ``per_host_delay_s``: minimum wall-clock interval between two requests
    to the same host, enforced within the task that owns the host.
    ``resolver``: optional ``host -> [ip_str]`` hook for the reference's
    resolve-and-check-all SSRF behavior where DNS exists.
    """
    from ares_spark.operators.ssrf import url_fetchable

    out_schema = T.StructType(list(batch.schema.fields) + FETCH_FIELDS)
    in_cols = [f.name for f in batch.schema.fields]
    sort_cols = ["host"] + ([order_col] if order_col in in_cols else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.request

        proxies = {"http": proxy, "https": proxy} if proxy else {}
        # ProxyHandler({}) also DISABLES env-var proxies: the stage must
        # never silently route through an ambient HTTP(S)_PROXY
        opener = urllib.request.build_opener(urllib.request.ProxyHandler(proxies))
        last_at: dict[str, float] = {}  # task-lifetime: pacing spans Arrow batches
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(sort_cols, kind="stable")
            htmls, statuses, whens, errors = [], [], [], []
            for url, host in zip(pdf["url"], pdf["host"]):
                body = status = err = None
                if ssrf:
                    ok, reason = url_fetchable(url, resolver=resolver)
                    if not ok:
                        err = reason
                if err is None:
                    if per_host_delay_s > 0:
                        wait = last_at.get(host, -1e18) + per_host_delay_s - time.time()
                        if wait > 0:
                            time.sleep(wait)
                    body, status, err = _fetch_one(opener, url, timeout_s, user_agent)
                    last_at[host] = time.time()
                htmls.append(body)
                statuses.append(status)
                whens.append(time.time())
                errors.append(err)
            out = pdf.copy()
            out["html"] = pd.Series(htmls, index=pdf.index, dtype=object)
            out["fetch_status"] = pd.Series(statuses, index=pdf.index, dtype=object)
            out["fetched_at"] = whens
            out["fetch_error"] = pd.Series(errors, index=pdf.index, dtype=object)
            yield out

    n = n_partitions or batch.sparkSession.sparkContext.defaultParallelism
    # one task owns a host: politeness is task-local state, no coordination
    return batch.repartition(n, F.col("host")).mapInPandas(run, out_schema)

"""ares_spark — a PySpark-native rebuild of the Ares scrape-and-extract engine.

Reference: AndreaBozzo/Ares (Rust, Apache-2.0) at /root/reference.
This package re-expresses the reference's per-URL async pipeline as an
idiomatic Spark dataflow: DataFrame operators + vectorized pandas UDFs,
a BFS frontier generation loop, and snapshot-checkpointed tables.

Nothing here is a port of the Rust code: the architecture is Spark-first
(declarative plans, Catalyst optimization, partition-aware shuffles); only
the *semantics* (cleaning dialect, crawl ordering, dedup, budgets, retry
schedule) mirror the reference, with file:line citations in docstrings.
"""

__version__ = "0.1.0"

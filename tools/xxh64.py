"""Back-compat shim: the pure-python XXH64 twin moved into the package
(ares_spark/functions/xxh64.py) so the engine's driver-local fast path
can share it; golden generators keep importing it from here."""

from ares_spark.functions.xxh64 import (  # noqa: F401
    hash_bytes,
    hash_int,
    hash_long,
    spark_xxhash64,
)

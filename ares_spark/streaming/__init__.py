"""Structured Streaming surface (SURVEY.md §2C).

The reference has no true streaming operators — its "stream" is a DB poll
loop — so the batch generation loop is the primary architecture. This
package provides the continuous-crawl variant for deployments that want a
standing query: a file-source frontier feeding the same fused extraction
pipeline with foreachBatch, plus watermarked per-host fetch-rate metrics.
"""

from ares_spark.streaming.continuous import (
    continuous_extraction_query,
    host_rate_metrics,
)

__all__ = ["continuous_extraction_query", "host_rate_metrics"]

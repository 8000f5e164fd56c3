"""The URL-frontier crawl engine: BFS generation loop over snapshot tables.

The Spark re-architecture of the reference's worker/queue
(/root/reference/crates/ares-core/src/worker.rs, job_repository.rs):
each BFS wave is one declarative DataFrame job; worker claim-races are
replaced by deterministic sort order; Postgres state by checkpointed
snapshot tables with per-partition lineage (north_rule).
"""

from ares_spark.crawl.loop import CrawlConfig, job_control, run_crawl, resume_crawl
from ares_spark.crawl.pagestore import BucketedPages, write_bucketed_pages

__all__ = [
    "BucketedPages",
    "CrawlConfig",
    "job_control",
    "run_crawl",
    "resume_crawl",
    "write_bucketed_pages",
]

"""Extraction-schema registry (SURVEY.md A25/A26).

Versioned JSON Schema documents resolved by ``name``, ``name@version`` or
``name@latest`` with semantic-version ordering, mirroring
/root/reference/crates/ares-core/src/schema.rs:88-206,413-438. Schemas are
plain files shipped with the package and broadcast to executors as a dict.
"""

from ares_spark.schemas.registry import SchemaRegistry, compare_versions

__all__ = ["SchemaRegistry", "compare_versions"]

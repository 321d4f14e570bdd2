"""readability_spark — PySpark-native main-content extraction engine.

Spark-first re-expression of mizchi/readability (/root/reference): the
pure-Python heuristics live in ``readability_core`` (shipped via --py-files);
this package provides the Arrow-batched UDFs, the salted/skew-aware
extraction pipeline with per-partition lineage, the relational operators
(node table, dedup, similarity, text stats), and the synthetic transcript
generator used by tests and benchmarks.
"""

from .pipeline import (
    build_session,
    derive_metrics,
    resume_filter,
    run_extraction,
    run_pipeline,
    salt_and_partition,
)
from .schema import EXTRACT_SCHEMA, NODE_SCHEMA, TRANSCRIPT_SCHEMA
from .udfs import explode_nodes, extract_udf, make_extract_udf, register_udfs

__all__ = [
    "build_session", "derive_metrics", "resume_filter", "run_extraction",
    "run_pipeline", "salt_and_partition", "EXTRACT_SCHEMA", "NODE_SCHEMA",
    "TRANSCRIPT_SCHEMA", "explode_nodes", "extract_udf", "make_extract_udf",
    "register_udfs",
]
__version__ = "0.1.0"

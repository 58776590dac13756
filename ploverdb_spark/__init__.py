"""ploverdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RTXteam/PloverDB.

The reference (``/root/reference``) is a single-node, fully in-memory Python
graph store serving TRAPI one-hop queries over Biolink knowledge graphs
(``app/app/plover.py``).  This package re-expresses every capability
Spark-first:

- ingest (KGX TSV/JSONL)            -> ``ploverdb_spark.sources.kgx``
- index build pipeline              -> ``ploverdb_spark.build``
- Biolink ontology operations       -> ``ploverdb_spark.ontology``
- TRAPI query answering             -> ``ploverdb_spark.query``
- LLM-data-pipeline operators       -> ``ploverdb_spark.operators``
- scalar/expression helpers         -> ``ploverdb_spark.functions``

Nothing is copied from the reference; each module cites the reference
file:line whose *behavior* it reimplements so parity can be audited.
"""

__version__ = "0.1.0"

from ploverdb_spark.session import get_spark  # noqa: F401

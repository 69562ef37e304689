"""voter_gateway_spark — a PySpark-native analytics engine with the
capabilities of the `voter_gateway` reference (ETL / record-linkage:
ingest, match, merge, dedup, audit), extended with large-scale
training-data pipeline operators (dedup families, similarity search,
text analysis, multimodal plumbing).

Architecture: declarative DataFrame plans (Catalyst optimizes),
iterative control flow only where semantics demand it (match cascade
with claiming, fuzzy top-1). No RDDs; Python UDFs only as the
escape hatch for true closures.
"""

from voter_gateway_spark.session import GatewaySession
from voter_gateway_spark.schema import render_expr, ColumnSpec

__version__ = "0.1.0"

__all__ = ["GatewaySession", "render_expr", "ColumnSpec", "__version__"]

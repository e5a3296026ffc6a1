"""graphydb_spark — a PySpark-native property-graph analytics engine.

Capability parity with aalexei/graphydb (reference at /root/reference/),
re-architected Spark-first: DataFrame storage, chain-DSL → Spark SQL
compilation, Catalyst-owned optimization, plus large-scale data-pipeline
operators (dedup, similarity search, text analysis, streaming) the
reference does not have.
"""

from .graph import EDGE_SCHEMA, NODE_SCHEMA, Graph
from .items import Edge, GraphydbError, Node, generate_uid
from .sets import ESet, IndexedSet, NSet
from .session import get_spark

__all__ = [
    "Graph", "Node", "Edge", "NSet", "ESet", "IndexedSet",
    "GraphydbError", "generate_uid", "get_spark",
    "NODE_SCHEMA", "EDGE_SCHEMA",
]

__version__ = "0.1.0"

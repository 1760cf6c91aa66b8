"""pagerank_optimization_spark — a from-scratch PySpark-native link-graph
analytics engine with the query/data-processing capabilities of
markoleptic/PageRank-Optimization (reference at /root/reference, cited by
file:line in docstrings), re-expressed Spark-first.

Layout
------
- ``session``            SparkSession builder (Arrow on, AQE on)
- ``sources``            transcript synthesis + events→transcripts derivation
- ``operators``          graph build, PageRank (2 kernels), CC, LPA, triangles,
                         dedup, similarity, multimodal plumbing
- ``functions``          entity/text/vector column expressions
- ``plans``              partitioning / skew / explain helpers
- ``streaming``          structured-streaming edge ingestion
- ``checkpoint``         per-superstep checkpoint/resume + metrics
"""

__version__ = "0.1.0"

from pagerank_optimization_spark.graph import LinkGraph  # noqa: F401
from pagerank_optimization_spark.session import get_spark  # noqa: F401

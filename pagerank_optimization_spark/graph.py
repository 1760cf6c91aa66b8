"""LinkGraph — the user-facing facade bundling a built graph with its
algorithms (the ergonomic equivalent of the reference's
`multiformat_graph_t` handle, pagerank.h:16-32: one logical graph, several
physical views, one API).

    from pagerank_optimization_spark import LinkGraph
    g = LinkGraph.from_transcripts(transcripts_df)
    ranks = g.pagerank(tol=1e-6).ranks
    comps = g.connected_components()
    n_tri = g.triangle_count()
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LinkGraph:
    vertices: DataFrame  # (entity)
    edges: DataFrame     # (src, dst, weight) column-stochastic

    @classmethod
    def from_transcripts(cls, transcripts: DataFrame) -> "LinkGraph":
        from pagerank_optimization_spark.operators.graph_build import build_graph

        vertices, edges = build_graph(transcripts)
        return cls(vertices=vertices, edges=edges)

    @classmethod
    def from_events(cls, events: DataFrame) -> "LinkGraph":
        from pagerank_optimization_spark.sources.transcripts import transcripts_from_events

        return cls.from_transcripts(transcripts_from_events(events))

    @classmethod
    def from_edges(cls, edges: DataFrame) -> "LinkGraph":
        """Raw (src, dst) edge list → normalized graph (weights recomputed)."""
        from pagerank_optimization_spark.operators.graph_build import normalize_edges

        vertices = (
            edges.select(F.col("src").alias("entity"))
            .unionByName(edges.select(F.col("dst").alias("entity")))
            .distinct()
        )
        return cls(vertices=vertices, edges=normalize_edges(edges.select("src", "dst").distinct()))

    # -- algorithms -----------------------------------------------------------
    def pagerank(self, **kwargs):
        from pagerank_optimization_spark.operators.pagerank import pagerank

        return pagerank(self.vertices, self.edges, **kwargs)

    def connected_components(self, **kwargs) -> DataFrame:
        from pagerank_optimization_spark.operators.components import connected_components

        return connected_components(self.vertices, self.edges, **kwargs)

    def label_propagation(self, **kwargs) -> DataFrame:
        from pagerank_optimization_spark.operators.lpa import label_propagation

        return label_propagation(self.vertices, self.edges, **kwargs)

    def triangle_count(self, **kwargs) -> int:
        from pagerank_optimization_spark.operators.triangles import triangle_count

        return int(triangle_count(self.edges, **kwargs).collect()[0][0])

    def degrees(self) -> DataFrame:
        from pagerank_optimization_spark.operators.graph_build import out_degrees

        return out_degrees(self.edges)

    def cache(self) -> "LinkGraph":
        self.vertices = self.vertices.cache()
        self.edges = self.edges.cache()
        return self

"""neo4j_webgraph_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch with the query/data-processing capabilities of the
reference ``fgavilondo/neo4j-webgraph`` (a Java crawler importing a web
link graph into embedded Neo4j), re-expressed as Ray Data pipelines over
Parquet transcript tables: edge derivation, vertex/edge dedup, degree
aggregation, a relational query surface, iterative graph algorithms
(PageRank / connected components / label propagation / triangle count)
as groupby-aggregate shuffles with per-superstep checkpoints, and an
actor-pool enrichment-stage API.

See SURVEY.md at the repo root for the full blueprint and the mapping of
every reference operator (file:line citations) onto this package.
"""

__version__ = "0.1.0"

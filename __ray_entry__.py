"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive transcripts,
    build the deduplicated edge + vertex tables (degree counters, content
    merge), return the vertex table."""
    from neo4j_webgraph_ray.queries import q_vertices

    return q_vertices("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from neo4j_webgraph_ray.queries import (
        GRAPH_ANALYTICS_QUERIES,
        RELATIONAL_QUERIES,
    )
    from neo4j_webgraph_ray.queries_docs import DOC_QUERIES
    from neo4j_webgraph_ray.queries_rel2 import REL2_QUERIES
    from neo4j_webgraph_ray.queries_rel3 import REL3_QUERIES
    from neo4j_webgraph_ray.queries_rel4 import REL4_QUERIES
    from neo4j_webgraph_ray.queries_rel5 import REL5_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(GRAPH_ANALYTICS_QUERIES)
    out.update(DOC_QUERIES)
    out.update(REL2_QUERIES)
    out.update(REL3_QUERIES)
    out.update(REL4_QUERIES)
    out.update(REL5_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names)."""
    from neo4j_webgraph_ray.queries import (
        GRAPH_ANALYTICS_ORACLES,
        RELATIONAL_ORACLES,
    )
    from neo4j_webgraph_ray.queries_docs import DOC_ORACLES
    from neo4j_webgraph_ray.queries_rel2 import REL2_ORACLES
    from neo4j_webgraph_ray.queries_rel3 import REL3_ORACLES
    from neo4j_webgraph_ray.queries_rel4 import REL4_ORACLES
    from neo4j_webgraph_ray.queries_rel5 import REL5_ORACLES

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(GRAPH_ANALYTICS_ORACLES)
    out.update(DOC_ORACLES)
    out.update(REL2_ORACLES)
    out.update(REL3_ORACLES)
    out.update(REL4_ORACLES)
    out.update(REL5_ORACLES)
    return out

"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in the library)
initialises or shuts down Ray. ``queries()`` maps operator names from
SURVEY.md §2 to callables over an sf_dir; ``oracle_sql()`` gives the
DuckDB-equivalent SQL over the pre-registered testdata views.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001: pages -> text extraction -> triple
    extraction + entity linking -> canonical quads (s, p, o, g)."""
    from virtuoso_quad_log_ray.pipelines import kg

    return kg.build_quads("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from virtuoso_quad_log_ray.pipelines import changelog as cl
    from virtuoso_quad_log_ray.pipelines import kg

    return {
        # --- KG construction core (SURVEY.md §2.1-§2.6) ---
        "kg_quads": lambda sf: kg.build_quads(sf),
        "kg_extract_text": lambda sf: kg.extracted_text(sf),
        "kg_entity_links": lambda sf: kg.entity_links(sf),
        "kg_graph_stats": lambda sf: kg.graph_stats(sf),
        "kg_dedup_exact": lambda sf: kg.dedup_quads(kg.build_quads(sf)),
        "kg_chunk_plan": lambda sf: kg.chunk_plan(sf, max_quads_per_file=50),
        "kg_rdfpatch_lines": lambda sf: kg.rdfpatch_lines(sf),
        "kg_changelog": lambda sf: cl.changelog(sf),
    }


def oracle_sql() -> dict[str, str]:
    from virtuoso_quad_log_ray.pipelines import changelog as cl
    from virtuoso_quad_log_ray.pipelines import kg

    return {
        "kg_quads": kg.QUADS_SQL,
        "kg_extract_text": kg.EXTRACTED_TEXT_SQL,
        "kg_entity_links": kg.ENTITY_LINKS_SQL,
        "kg_graph_stats": kg.GRAPH_STATS_SQL,
        "kg_dedup_exact": kg.DEDUP_QUADS_SQL,
        "kg_chunk_plan": kg.chunk_plan_sql(50),
        "kg_rdfpatch_lines": kg.RDFPATCH_LINES_SQL,
        "kg_changelog": cl.changelog_sql(),
    }

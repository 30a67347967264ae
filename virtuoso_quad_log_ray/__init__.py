"""virtuoso_quad_log_ray — a Ray-Data-native KG-construction + quad-changelog engine.

A from-scratch re-expression of the capabilities of CLARIAH/virtuoso-quad-log
(reference at /root/reference, cited by file:line in docstrings) as an idiomatic
Ray Data pipeline over Parquet tables of Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
        -> text extraction (map_batches, zero-copy Arrow)
        -> triple extraction + entity linking (vectorized / actor pools)
        -> canonical quads (s, p, o, g=url)
        -> exact + near dedup (hash / MinHash-LSH groupby shuffles)
        -> rdfpatch changelog (+/- records via hash anti-join vs prior checkpoint)
        -> chunked, per-graph partitioned publication with manifest-commit atomicity

Nothing here calls ray.init()/ray.shutdown(); the embedding application owns the
Ray session (driver contract, see __ray_entry__.py).
"""

from virtuoso_quad_log_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.2.0"


def __getattr__(name):
    """Lazy public API (keeps `import virtuoso_quad_log_ray` light — heavy
    modules load on first attribute access, never at package import)."""
    lazy = {
        "build_quads": ("virtuoso_quad_log_ray.pipelines.kg", "build_quads"),
        "quads_from_pages": ("virtuoso_quad_log_ray.pipelines.kg", "quads_from_pages"),
        "read_pages_parquet": ("virtuoso_quad_log_ray.sources.pages", "read_pages_parquet"),
        "read_pages_jsonl": ("virtuoso_quad_log_ray.sources.pages", "read_pages_jsonl"),
        "read_pages_warc": ("virtuoso_quad_log_ray.sources.warc", "read_pages_warc"),
        "run_dump_pages": ("virtuoso_quad_log_ray.pipelines.runs", "run_dump_pages"),
        "run_sync_pages": ("virtuoso_quad_log_ray.pipelines.runs", "run_sync_pages"),
        "run_loop": ("virtuoso_quad_log_ray.pipelines.runs", "run_loop"),
        "materialize_quads": ("virtuoso_quad_log_ray.pipelines.materialize", "materialize_quads"),
        "read_materialized": ("virtuoso_quad_log_ray.pipelines.materialize", "read_materialized"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'virtuoso_quad_log_ray' has no attribute {name!r}")

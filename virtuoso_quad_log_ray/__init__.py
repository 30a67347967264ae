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
__version__ = "0.1.0"

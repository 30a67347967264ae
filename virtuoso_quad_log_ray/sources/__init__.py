from virtuoso_quad_log_ray.sources.pages import PAGES_SQL_CTE, read_pages

__all__ = ["read_pages", "PAGES_SQL_CTE"]

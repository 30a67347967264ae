from virtuoso_quad_log_ray.stages.extract_text import extract_text, extract_text_batch
from virtuoso_quad_log_ray.stages.extract_triples import TripleExtractor, extract_triples

__all__ = ["extract_text", "extract_text_batch", "TripleExtractor", "extract_triples"]

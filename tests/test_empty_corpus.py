"""Empty-corpus behavior: every corpus-facing operator must yield an empty
result (correct schema, no crash). Ray's hash join cannot resolve key fields
over a fully empty input, so the self-join pipelines short-circuit."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import to_arrow

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    pq.write_table(DOC_SCHEMA.empty_table(), os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
def test_empty_corpus_operators(empty_sf):
    from virtuoso_quad_log_ray.pipelines import kg
    from virtuoso_quad_log_ray.stages import dedup as dd
    from virtuoso_quad_log_ray.stages import textstats as tx

    cases = {
        "quads": kg.build_quads(empty_sf),
        "dedup_exact": dd.dedup_pages_exact(empty_sf),
        "ngram": dd.ngram_jaccard_pairs(empty_sf),
        "minhash": dd.minhash_lsh_pairs(empty_sf),
        "simhash": dd.simhash_pairs(empty_sf),
        "lang_id": tx.lang_id(empty_sf),
        "winnow": tx.winnow_fingerprints(empty_sf),
        "quality": tx.text_quality(empty_sf),
    }
    for name, ds in cases.items():
        t = to_arrow(ds)
        assert len(t) == 0, name


@pytest.mark.usefixtures("ray_session")
def test_empty_pair_schemas(empty_sf):
    """Short-circuited pair miners still expose their real output schema."""
    from virtuoso_quad_log_ray.stages import dedup as dd

    assert to_arrow(dd.ngram_jaccard_pairs(empty_sf)).column_names == [
        "url_a",
        "url_b",
        "jaccard_ppm",
    ]
    assert to_arrow(dd.minhash_lsh_pairs(empty_sf)).column_names == [
        "url_a",
        "url_b",
        "est_jaccard_ppm",
    ]

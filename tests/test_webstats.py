"""Per-site crawl stats, bounded inverted-index sample, KG entity degrees."""

import pytest

from tests.conftest import SF_SMALL, assert_matches_oracle, to_arrow
from virtuoso_quad_log_ray.pipelines import kg
from virtuoso_quad_log_ray.stages import webstats as ws


@pytest.mark.usefixtures("ray_session")
class TestDomainStats:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            ws.web_domain_stats(SF_SMALL), oracle, ws.WEB_DOMAIN_STATS_SQL, ["site"]
        )

    def test_invariants(self):
        t = to_arrow(ws.web_domain_stats(SF_SMALL))
        import pyarrow.compute as pc

        # distinct content never exceeds pages; site totals cover the corpus
        assert pc.all(
            pc.less_equal(t["n_distinct_texts"], t["n_pages"])
        ).as_py()
        # 500 base docs + 20 mirror + 17 v2 variants = 537 page rows
        assert pc.sum(t["n_pages"]).as_py() == 537


@pytest.mark.usefixtures("ray_session")
class TestPostings:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            ws.text_postings(SF_SMALL), oracle, ws.text_postings_sql(), ["term"]
        )

    def test_sample_is_capped_and_sorted(self):
        t = to_arrow(ws.text_postings(SF_SMALL))
        for urls, n_docs in zip(
            t["sample_urls"].to_pylist(), t["n_docs"].to_pylist()
        ):
            sample = urls.split(",")
            assert len(sample) == min(ws.POSTINGS_SAMPLE_K, n_docs)
            assert sample == sorted(sample)


@pytest.mark.usefixtures("ray_session")
class TestEntityDegree:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            kg.entity_degree(SF_SMALL), oracle, kg.ENTITY_DEGREE_SQL, ["canon"]
        )

    def test_degree_consistent_with_links(self):
        import collections

        links = to_arrow(kg.entity_links(SF_SMALL))
        deg = to_arrow(kg.entity_degree(SF_SMALL))
        by_canon = collections.defaultdict(lambda: [0, set(), set()])
        for u, s, c in zip(
            links["url"].to_pylist(),
            links["surface"].to_pylist(),
            links["canon"].to_pylist(),
        ):
            e = by_canon[c]
            e[0] += 1
            e[1].add(u)
            e[2].add(s)
        for c, nl, np_, ns in zip(
            deg["canon"].to_pylist(),
            deg["n_links"].to_pylist(),
            deg["n_pages"].to_pylist(),
            deg["n_surfaces"].to_pylist(),
        ):
            assert (nl, np_, ns) == (
                by_canon[c][0],
                len(by_canon[c][1]),
                len(by_canon[c][2]),
            )

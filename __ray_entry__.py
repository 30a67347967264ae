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
    from virtuoso_quad_log_ray.config import DEFAULT_CONFIG as cfg
    from virtuoso_quad_log_ray.pipelines import changelog as cl
    from virtuoso_quad_log_ray.pipelines import kg
    from virtuoso_quad_log_ray.pipelines import relational as rel
    from virtuoso_quad_log_ray.stages import canonicalize as cz
    from virtuoso_quad_log_ray.stages import dedup as dd
    from virtuoso_quad_log_ray.stages import multimodal as mm
    from virtuoso_quad_log_ray.stages import similarity as sim
    from virtuoso_quad_log_ray.stages import sketches as sk
    from virtuoso_quad_log_ray.stages import textstats as tx
    from virtuoso_quad_log_ray.stages import webstats as ws

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
        "kg_changelog_stats": lambda sf: cl.changelog_stats(sf),
        # --- document dedup suite (D2 / north_star canonicalization) ---
        "dedup_pages_exact": lambda sf: dd.dedup_pages_exact(sf),
        "dedup_url_canon": lambda sf: dd.dedup_url_canon(sf),
        "dedup_ngram_jaccard": lambda sf: dd.ngram_jaccard_pairs(sf),
        "dedup_clusters": lambda sf: cz.canonicalize_pages(sf),
        # --- text analysis ---
        "text_quality": lambda sf: tx.text_quality(sf),
        "text_fingerprints": lambda sf: tx.fingerprints(sf),
        "text_token_counts": lambda sf: tx.token_counts(sf),
        "text_corpus_filter": lambda sf: tx.corpus_filter(sf),
        "text_stats_by_lang": lambda sf: tx.corpus_stats_by_lang(sf),
        "text_shard_plan": lambda sf: tx.shard_plan(sf),
        "text_redact_pii": lambda sf: tx.redact_pii(sf),
        "text_chunks": lambda sf: tx.text_chunks(sf),
        # --- multimodal binary-column stages (decode stubbed, plumbing real) ---
        "mm_media_metadata": lambda sf: mm.media_metadata(sf),
        # wide (one int64 col per bin) so the value hash is SQL-comparable;
        # the list-column form is the library surface (mm.byte_histogram)
        "mm_byte_histogram": lambda sf: mm.byte_histogram_wide(sf),
        # oracle-comparable projection (drops the binary frame payload, which
        # SQL can't reproduce); the full frame layout is pytest-covered
        "mm_frame_sample": lambda sf: mm.frame_sample_meta(sf),
        # --- similarity search over embeddings ---
        "ann_topk": lambda sf: sim.ann_topk(sf),
        # --- relational coverage (filters/aggregates/joins/sort/windows) ---
        "rel_pricing_summary": lambda sf: rel.pricing_summary(sf),
        "rel_revenue_by_nation": lambda sf: rel.revenue_by_nation(sf),
        "rel_top_orders": lambda sf: rel.top_orders(sf),
        "rel_events_hourly": lambda sf: rel.events_hourly(sf),
        "rel_latest_event": lambda sf: rel.latest_event_per_user(sf),
        "rel_user_sessions": lambda sf: rel.user_sessions(sf),
        "rel_filtered_events": lambda sf: rel.filtered_event_stats(sf),
        "rel_asof_prev_event": lambda sf: rel.asof_prev_event(sf),
        "rel_range_window": lambda sf: rel.range_window_counts(sf),
        "text_sample_stratified": lambda sf: tx.sample_stratified(sf),
        # deterministic seeded shuffle into training shards (stable across
        # runs and cluster sizes, unlike random_shuffle)
        "text_shuffle_shards": lambda sf: tx.shuffle_shards(sf),
        # exact-k per-group deterministic sample (content-addressed)
        "text_sample_group_k": lambda sf: tx.sample_group_k(sf),
        "text_contamination": lambda sf: tx.contamination(sf),
        "text_pack_plan": lambda sf: tx.pack_plan(sf),
        "text_repetition": lambda sf: tx.text_repetition(sf),
        "text_tfidf_top_terms": lambda sf: tx.tfidf_top_terms(sf),
        "rel_value_quantiles": lambda sf: rel.value_quantiles(sf),
        # --- per-site crawl accounting + bounded inverted index + KG degrees ---
        "web_domain_stats": lambda sf: ws.web_domain_stats(sf),
        "text_postings": lambda sf: ws.text_postings(sf),
        "kg_entity_degree": lambda sf: kg.entity_degree(sf),
        "kg_entity_cooccur": lambda sf: kg.entity_cooccur(sf),
        # rdfpatch APPLY (consumer side): replay(v1, changelog) == fresh v2
        "kg_state_replay": lambda sf: cl.replay_state(sf),
        # incremental crawl vs prior fingerprint index (anti-join admit)
        "dedup_incremental": lambda sf: dd.dedup_incremental(sf),
        # end-to-end curation flagship: gate -> exact-dedup keep-first -> shard
        "text_corpus_curate": lambda sf: tx.corpus_curate(sf),
        # EXACT despite the sketch: Misra-Gries candidates -> exact recount
        "text_heavy_hitters": lambda sf: sk.heavy_hitters(sf),
        # ---------------------------------------------------------------
        # Entries past this line sit beyond the driver snapshot's 50-query
        # prefix: rel_* are oracle-backed variants of in-prefix siblings
        # (top_orders / range_window / dedup_incremental); text_winnow_fp,
        # dedup_minhash_lsh, dedup_simhash, dedup_incremental_bloom and
        # sketch_distinct_users are oracle-backed (the SQL re-derives the
        # hash/filter/sketch itself); the rest are float-iterative or
        # model-trained -> rows-only by construction, with determinism /
        # error / recall bounds pinned in pytest.
        # ---------------------------------------------------------------
        "rel_top_orders_by_priority": lambda sf: rel.top_orders_by_priority(sf),
        "rel_events_sliding": lambda sf: rel.events_sliding(sf),
        "rel_customers_no_urgent": lambda sf: rel.customers_no_urgent_orders(sf),
        # banded MinHash / SimHash — both oracle-backed (the SQL re-derives
        # signatures, band buckets, pair emission and verify end to end)
        "dedup_minhash_lsh": lambda sf: dd.minhash_lsh_pairs(sf),
        "dedup_simhash": lambda sf: dd.simhash_pairs(sf),
        # corpus-trained trigram profiles -> no SQL analog
        "text_lang_id": lambda sf: tx.lang_id(sf),
        # deterministic winnowing — oracle-backed (rolling hash in SQL)
        "text_winnow_fp": lambda sf: tx.winnow_fingerprints(sf),
        # approximate ANN / clustering: recall@k vs exact ann_topk pinned
        "ann_topk_ivf": lambda sf: sim.ann_topk_ivf(sf),
        "emb_clusters": lambda sf: sim.embedding_clusters(sf),
        "emb_neardup_lsh": lambda sf: sim.embedding_neardup_pairs(sf),
        # iterative fixpoint -> rows-only (pinned in pytest against a dense
        # power-iteration reference and the forced-distributed path)
        "kg_entity_pagerank": lambda sf: kg.entity_pagerank(sf),
        # broadcast Bloom-membership scale path: no false negatives, a
        # bounded FPR of new pages wrongly dropped — oracle-backed (the SQL
        # simulates the filter exactly, false positives included)
        "dedup_incremental_bloom": lambda sf: dd.dedup_incremental_bloom(sf),
        # HLL sketch — oracle-backed: the SQL re-derives the sketch itself
        # (splitmix64 + registers + estimator), value-checking the estimate
        # error included; merge property additionally covered in pytest
        "sketch_distinct_users": lambda sf: sk.events_distinct_users(sf),
    }


def oracle_sql() -> dict[str, str]:
    from virtuoso_quad_log_ray.config import DEFAULT_CONFIG as cfg
    from virtuoso_quad_log_ray.pipelines import changelog as cl
    from virtuoso_quad_log_ray.pipelines import kg
    from virtuoso_quad_log_ray.pipelines import relational as rel
    from virtuoso_quad_log_ray.stages import canonicalize as cz
    from virtuoso_quad_log_ray.stages import dedup as dd
    from virtuoso_quad_log_ray.stages import multimodal as mm
    from virtuoso_quad_log_ray.stages import similarity as sim
    from virtuoso_quad_log_ray.stages import sketches as sk
    from virtuoso_quad_log_ray.stages import textstats as tx
    from virtuoso_quad_log_ray.stages import webstats as ws

    return {
        "kg_quads": kg.QUADS_SQL,
        "kg_extract_text": kg.EXTRACTED_TEXT_SQL,
        "kg_entity_links": kg.ENTITY_LINKS_SQL,
        "kg_graph_stats": kg.GRAPH_STATS_SQL,
        "kg_dedup_exact": kg.DEDUP_QUADS_SQL,
        "kg_chunk_plan": kg.chunk_plan_sql(50),
        "kg_rdfpatch_lines": kg.RDFPATCH_LINES_SQL,
        "kg_changelog": cl.changelog_sql(),
        "kg_changelog_stats": cl.changelog_stats_sql(),
        "dedup_pages_exact": dd.DEDUP_PAGES_EXACT_SQL,
        "dedup_url_canon": dd.DEDUP_URL_CANON_SQL,
        "dedup_ngram_jaccard": dd.ngram_jaccard_sql(
            cfg.jaccard_threshold, cfg.shingle_size
        ),
        # text_lang_id / emb_neardup_lsh / ann_topk_ivf / emb_clusters /
        # kg_entity_pagerank: float-iterative or model-trained -> rows-only
        # (the deterministic hash/sketch paths all have oracle entries below)
        "dedup_clusters": cz.canonicalize_sql(cfg.jaccard_threshold, cfg.shingle_size),
        "mm_frame_sample": mm.FRAME_SAMPLE_SQL,
        "mm_byte_histogram": mm.BYTE_HISTOGRAM_SQL,
        "text_quality": tx.TEXT_QUALITY_SQL,
        "text_fingerprints": tx.FINGERPRINTS_SQL,
        "text_token_counts": tx.TOKEN_COUNTS_SQL,
        "text_corpus_filter": tx.CORPUS_FILTER_SQL,
        "text_stats_by_lang": tx.CORPUS_STATS_BY_LANG_SQL,
        "text_shard_plan": tx.shard_plan_sql(),
        "text_redact_pii": tx.REDACT_PII_SQL,
        "text_chunks": tx.TEXT_CHUNKS_SQL,
        "mm_media_metadata": mm.MEDIA_METADATA_SQL,
        "ann_topk": sim.ann_topk_sql(),
        "rel_pricing_summary": rel.PRICING_SUMMARY_SQL,
        "rel_revenue_by_nation": rel.REVENUE_BY_NATION_SQL,
        "rel_top_orders": rel.top_orders_sql(),
        "rel_events_hourly": rel.EVENTS_HOURLY_SQL,
        "rel_latest_event": rel.LATEST_EVENT_SQL,
        "rel_user_sessions": rel.USER_SESSIONS_SQL,
        "rel_filtered_events": rel.FILTERED_EVENT_STATS_SQL,
        "rel_asof_prev_event": rel.ASOF_PREV_EVENT_SQL,
        "rel_range_window": rel.RANGE_WINDOW_COUNTS_SQL,
        "text_sample_stratified": tx.sample_stratified_sql(),
        "text_shuffle_shards": tx.shuffle_shards_sql(),
        "text_sample_group_k": tx.sample_group_k_sql(),
        "text_contamination": tx.contamination_sql(),
        "text_pack_plan": tx.pack_plan_sql(),
        "text_repetition": tx.TEXT_REPETITION_SQL,
        "text_tfidf_top_terms": tx.tfidf_top_terms_sql(),
        "rel_top_orders_by_priority": rel.TOP_ORDERS_BY_PRIORITY_SQL,
        "rel_value_quantiles": rel.VALUE_QUANTILES_SQL,
        "rel_events_sliding": rel.EVENTS_SLIDING_SQL,
        "rel_customers_no_urgent": rel.CUSTOMERS_NO_URGENT_SQL,
        "web_domain_stats": ws.WEB_DOMAIN_STATS_SQL,
        "text_postings": ws.text_postings_sql(),
        "kg_entity_degree": kg.ENTITY_DEGREE_SQL,
        "kg_entity_cooccur": kg.ENTITY_COOCCUR_SQL,
        "kg_state_replay": cl.replay_state_sql(),
        "dedup_incremental": dd.dedup_incremental_sql(),
        "text_corpus_curate": tx.corpus_curate_sql(),
        "text_heavy_hitters": sk.heavy_hitters_sql(),
        # deterministic winnowing: same base-257 rolling hash mod 2^64 in
        # HUGEINT SQL + frame-bounded window minima
        "text_winnow_fp": tx.winnow_sql(),
        # exact SQL simulation of the Bloom filter (same md5-LE-uint64
        # double hashing, same bit positions — false positives reproduced)
        "dedup_incremental_bloom": dd.dedup_incremental_bloom_sql(),
        # exact SQL simulation of the HLL sketch (splitmix64 in modular
        # HUGEINT, clz via bin(), integer-exact register sum + estimator)
        "sketch_distinct_users": sk.events_distinct_users_sql(),
        # exact SQL re-derivation of the whole MinHash-LSH pipeline
        # (md5 base hashes, 64 perms in modular HUGEINT, FNV band keys,
        # capped pair emission, matching-perm verify)
        "dedup_minhash_lsh": dd.minhash_lsh_sql(),
        # exact SQL re-derivation of SimHash (frequency-weighted bit votes,
        # pigeonhole bands, bit_count(xor) Hamming verify)
        "dedup_simhash": dd.simhash_sql(),
    }

"""KG construction pipeline: pages -> canonical quads (+ dump-mode shaping).

Ray-Data-first re-expression of the reference's dump path
(quad-logger/sql-proc/dump_nquads.sql:11-84):

  read pages -> extract text (M11) -> extract+link triples (M12/E1)
    -> excluded-graphs filter (F1, dump_nquads.sql:44-49)
    -> exact dedup (D1, the table-id echo filter analog, parse_trx_logs.sql:102-109)
    -> per-graph grouping + maxq chunk plan (G2/G4, buffer_nquads.sql:8-29)

The reference needed a GLOBAL ``ORDER BY ?g`` (dump_nquads.sql:49) or an
unbounded in-server dict buffer (documented OOM, buffer_nquads.sql:7) to get
graph-homogeneous files; here a hash ``groupby('g')`` shuffle does it with
bounded memory — exactly the skew/memory bug Ray Data's shuffle fixes
(SURVEY.md §4).

Each pipeline function has a lockstep DuckDB oracle SQL builder used by
__ray_entry__.oracle_sql(); keep them in sync (tests assert equality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig
from virtuoso_quad_log_ray.sources.pages import PAGES_SQL_CTE, read_pages
from virtuoso_quad_log_ray.stages.extract_text import extract_text
from virtuoso_quad_log_ray.stages.extract_triples import (
    ALIAS_PAIRS,
    ENTITY_NS,
    VOCAB,
    XSD_INTEGER,
    extract_triples,
)

# ---------------------------------------------------------------------------
# Shared SQL fragments (lockstep with the vectorized stages)
# ---------------------------------------------------------------------------

ALIASES_SQL_VALUES = ",\n        ".join(f"('{s}', '{c}')" for s, c in ALIAS_PAIRS)

# quads CTE over the pages CTE — mirrors TripleExtractor exactly.
QUADS_SQL_CTE = f"""
aliases(surface, canon) AS (VALUES
        {ALIASES_SQL_VALUES}),
toks AS (
    SELECT url, unnest(string_split(text, ' ')) AS tok FROM pages
),
mentions AS (
    SELECT DISTINCT t.url, a.canon FROM toks t JOIN aliases a ON a.surface = t.tok
),
quads AS (
    SELECT '<' || url || '>' AS s, '<{VOCAB}lang>' AS p,
           '"' || lang || '"' AS o, url AS g FROM pages
    UNION ALL
    SELECT '<' || url || '>', '<{VOCAB}source>',
           '"' || regexp_extract(url, 'https://example\\.org/([^/]+)/', 1) || '"', url FROM pages
    UNION ALL
    SELECT '<' || url || '>', '<{VOCAB}tokenCount>',
           '"' || len(string_split(text, ' ')) || '"^^<{XSD_INTEGER}>', url FROM pages
    UNION ALL
    SELECT '<' || url || '>', '<{VOCAB}mentions>',
           '<{ENTITY_NS}' || canon || '>', url FROM mentions
)
""".strip()


def sql_with_pages(body: str, extra_cte: str = "") -> str:
    """WITH pages [, quads][, extra] AS (...) <body>."""
    ctes = [PAGES_SQL_CTE]
    if extra_cte:
        ctes.append(extra_cte)
    return "WITH " + ",\n".join(ctes) + "\n" + body


# ---------------------------------------------------------------------------
# Pipelines
# ---------------------------------------------------------------------------


def quads_from_pages(
    pages: ray.data.Dataset, cfg: EngineConfig = DEFAULT_CONFIG, *, from_html: bool = True
) -> ray.data.Dataset:
    """pages Dataset (url, warc_ts, [html,] text, lang) -> (s, p, o, g)
    quads — the source-agnostic extraction pipeline. Feed it either the
    sandbox's synthesized pages (``read_pages``) or a REAL pages Parquet
    table (``sources.pages.read_pages_parquet``, the input_hint schema).

    ``from_html=True`` runs the real path (html -> text extraction first);
    the html column never survives past the first stage.
    """
    if from_html:
        pages = extract_text(
            pages, batch_size=cfg.pages_batch_size, extractor=cfg.extractor
        )
    quads = extract_triples(pages, batch_size=cfg.quads_batch_size)
    if cfg.excluded_graphs:
        # F1 excluded-graphs filter (dump_nquads.sql:44-49): tiny IN-list,
        # evaluated vectorized per batch; at scale this pushes into the read
        # when graphs map to partition paths.
        excluded = pa.array(list(cfg.excluded_graphs), type=pa.string())
        quads = quads.map_batches(
            lambda b: b.filter(pc.invert(pc.is_in(b["g"], value_set=excluded))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return quads


def build_quads(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG, *, from_html: bool = True
) -> ray.data.Dataset:
    """Full extraction pipeline over the sandbox sf_dir (synthesized pages);
    see ``quads_from_pages`` for the source-agnostic form."""
    pages = read_pages(sf_dir, include_html=from_html)
    return quads_from_pages(pages, cfg, from_html=from_html)


QUADS_SQL = sql_with_pages("SELECT s, p, o, g FROM quads", QUADS_SQL_CTE)


def dedup_quads(quads: ray.data.Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """D1 exact dedup on quad identity.

    The reference deduplicates multi-index trx echoes with a table-id filter
    (parse_trx_logs.sql:102-109); generically this is distinct-by-key. The
    quad identity is the MULTI-COLUMN group key (s,p,o,g) — no packed
    separator key: the escape chain (faithful to the reference's
    vql_escape_chars) passes U+001F through, so any single-char-separator
    packing would silently corrupt literals containing it (ADVICE r1).
    ``groupby().count()`` pre-aggregates per block BEFORE the hash shuffle,
    so only distinct quads move. Never map_groups over millions of
    single-row groups.
    """
    from virtuoso_quad_log_ray.stages.dedup import _hash128
    from virtuoso_quad_log_ray.stages.shuffle import bucket_aggregate

    def keyed(b: pa.Table) -> pa.Table:
        # in-batch combiner: collapse duplicate quads before the shuffle
        t = b.select(["s", "p", "o", "g"]).group_by(["s", "p", "o", "g"]).aggregate([])
        if len(t) == 0:
            return t.append_column("hv", pa.array([], type=pa.int64()))
        # bucketing hash over the packed terms — ONLY a distribution aid:
        # grouping is on the real columns, so a 0x1f inside a literal can
        # at worst skew a bucket, never corrupt a group (ADVICE r1 safe)
        packed = pc.binary_join_element_wise(t["s"], t["p"], t["o"], t["g"], "\x1f")
        if isinstance(packed, pa.ChunkedArray):
            packed = packed.combine_chunks()
        h1, _ = _hash128(packed)
        return t.append_column("hv", pa.array(h1))

    keyed_ds = quads.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    agg = bucket_aggregate(keyed_ds, ["s", "p", "o", "g"], [("g", "count")], hash_col="hv")
    return agg.select_columns(["s", "p", "o", "g"])


DEDUP_QUADS_SQL = sql_with_pages("SELECT DISTINCT s, p, o, g FROM quads", QUADS_SQL_CTE)


def graph_stats(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """A1/A6 — per-graph quad counts (the '# amount' header field and the
    quad_count/file_count report counters, buffer_nquads.sql:14-15,52-58).
    Ray's native count() pre-aggregates per block and is vectorized for a
    single Count — measured on par with the bucketed path here, so the
    simpler form stays."""
    quads = build_quads(sf_dir, cfg)
    return quads.groupby("g").count().rename_columns({"count()": "n_quads"})


GRAPH_STATS_SQL = sql_with_pages(
    "SELECT g, count(*) AS n_quads FROM quads GROUP BY g", QUADS_SQL_CTE
)


def chunk_plan(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    max_quads_per_file: int | None = None,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """G2/G4 — deterministic per-graph file chunking.

    Assigns every quad its output file sequence number: quads of one graph,
    ordered by (s, p, o), are packed maxq per file (MAX_QUADS_PER_FILE
    semantics, buffer_nquads.sql:24-27; default generate-rdfpatch.sh:15-16).

    The shuffle key is ``hash(g) % n_buckets``, not g: with graph = url the
    graph space has corpus cardinality and a per-graph map_groups schedules
    one task per page (VERDICT r1 scale-killer). Each bucket task sorts by
    (g, s, p, o) once and derives every contained graph's file_seq from
    segment-relative positions — vectorized, many graphs per task. No
    global sort (the reference's ORDER BY ?g, dump_nquads.sql:49, is
    unnecessary under hashing).
    """
    from virtuoso_quad_log_ray.pipelines.materialize import _bucket_of, default_n_buckets

    maxq = max_quads_per_file or cfg.max_quads_per_file
    nb = n_buckets or default_n_buckets()

    def keyed(b: pa.Table) -> pa.Table:
        return b.append_column("bucket", _bucket_of(b["g"], nb))

    def assign(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("g", "ascending"),
                ("s", "ascending"),
                ("p", "ascending"),
                ("o", "ascending"),
            ],
        )
        t = group.take(order).select(["s", "p", "o", "g"])
        g_np = t["g"].to_numpy(zero_copy_only=False)
        n = len(t)
        _, starts = np.unique(g_np, return_index=True)  # ascending (g sorted)
        seg_start = np.repeat(starts, np.diff(np.append(starts, n)))
        seq = (np.arange(n, dtype=np.int64) - seg_start) // maxq
        return t.append_column("file_seq", pa.array(seq))

    quads = build_quads(sf_dir, cfg)
    return (
        quads.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(assign, batch_format="pyarrow")
    )


def chunk_plan_sql(maxq: int) -> str:
    return sql_with_pages(
        "SELECT s, p, o, g, "
        f"       CAST((row_number() OVER (PARTITION BY g ORDER BY s, p, o) - 1) // {maxq} AS BIGINT) AS file_seq "
        "FROM quads",
        QUADS_SQL_CTE,
    )


def extracted_text(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """M11 surface: the byte-identical per-url text contract
    (BASELINE.json input_hint)."""
    return extract_text(
        read_pages(sf_dir), batch_size=cfg.pages_batch_size, extractor=cfg.extractor
    ).select_columns(["url", "text", "lang"])


EXTRACTED_TEXT_SQL = sql_with_pages("SELECT url, text, lang FROM pages")


def entity_links(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """E1 surface: distinct (url, surface, canonical) alias-dictionary links."""
    pages = read_pages(sf_dir, include_html=False)

    surfaces = pa.array([s for s, _ in ALIAS_PAIRS], type=pa.string())
    canonicals = pa.array([c for _, c in ALIAS_PAIRS], type=pa.string())

    def link(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        tokens = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens)
        hit = pc.is_in(flat, value_set=surfaces)
        flat_h = pc.filter(flat, hit)
        par_h = pc.filter(parents, hit)
        canon = pc.take(canonicals, pc.index_in(flat_h, surfaces))
        distinct = (
            pa.table({"i": par_h, "surface": flat_h, "canon": canon})
            .group_by(["i", "surface", "canon"])
            .aggregate([])
        )
        return pa.table(
            {
                "url": pc.take(url, distinct["i"]),
                "surface": distinct["surface"],
                "canon": distinct["canon"],
            }
        )

    return pages.map_batches(link, batch_format="pyarrow", zero_copy_batch=True)


ENTITY_LINKS_SQL = sql_with_pages(
    "SELECT DISTINCT t.url AS url, a.surface AS surface, a.canon AS canon\n"
    "FROM toks t JOIN aliases a ON a.surface = t.tok",
    QUADS_SQL_CTE,
)


def entity_degree(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Per-entity degree over the link graph: link rows, distinct pages and
    distinct surface forms per canonical entity — the node-degree accounting
    a KG build reports (the graph-level analog of A1's per-graph quad
    counters, dump_nquads.sql:37-44).

    Distributed shape: ``entity_links`` emits per-page-distinct triples and
    a page never splits across blocks, so each (url, surface, canon) row is
    GLOBALLY distinct and per-block (canon, url) pairs are globally
    distinct too — n_links and n_pages reduce to per-block C++ partials
    summed by one ``bucket_aggregate`` (|canons| rows per block). Only
    n_surfaces needs a global distinct, over the alias-dictionary-sized
    (canon, surface) set. One canon-keyed join of two entity-sized tables.
    """
    from virtuoso_quad_log_ray.numerics import hash128 as _h128
    from virtuoso_quad_log_ray.stages.shuffle import (
        bucket_aggregate,
        join_kwargs,
        scrub_empty_blocks,
    )

    links = entity_links(sf_dir, cfg)

    def count_partial(b: pa.Table) -> pa.Table:
        # rows in this block are globally distinct triples; urls are local
        # to the block -> exact per-block partials for both counters
        g = (
            b.select(["canon", "url"])
            .group_by(["canon", "url"])
            .aggregate([("url", "count")])
        )
        g2 = (
            pa.table({"canon": g["canon"], "links_p": g["url_count"]})
            .group_by(["canon"])
            .aggregate([("links_p", "sum"), ("links_p", "count")])
        )
        h1, _ = _h128(g2["canon"])
        return pa.table(
            {
                "canon": g2["canon"],
                "h1": pa.array(h1),
                "links_p": pc.cast(g2["links_p_sum"], pa.int64()),
                "pages_p": pc.cast(g2["links_p_count"], pa.int64()),
            }
        )

    counts = scrub_empty_blocks(
        bucket_aggregate(
            links.map_batches(
                count_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["canon"],
            [("links_p", "sum"), ("pages_p", "sum")],
            hash_col="h1",
        )
    ).map_batches(
        lambda b: pa.table(
            {
                "canon": b["canon"],
                "n_links": pc.cast(b["links_p_sum"], pa.int64()),
                "n_pages": pc.cast(b["pages_p_sum"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def surface_pairs(b: pa.Table) -> pa.Table:
        g = b.select(["canon", "surface"]).group_by(["canon", "surface"]).aggregate([])
        h1, _ = _h128(g["canon"])
        return g.append_column("h1", pa.array(h1))

    distinct_surfaces = bucket_aggregate(
        links.map_batches(surface_pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["canon", "surface"],
        [("surface", "count")],
        hash_col="h1",
    )

    def surface_counts(b: pa.Table) -> pa.Table:
        g = b.select(["canon"]).group_by(["canon"]).aggregate([("canon", "count")])
        h1, _ = _h128(g["canon"])
        return pa.table(
            {
                "canon": g["canon"],
                "h1": pa.array(h1),
                "s_p": pc.cast(g["canon_count"], pa.int64()),
            }
        )

    surfaces = scrub_empty_blocks(
        bucket_aggregate(
            distinct_surfaces.map_batches(
                surface_counts, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["canon"],
            [("s_p", "sum")],
            hash_col="h1",
        )
    ).map_batches(
        lambda b: pa.table(
            {"canon": b["canon"], "n_surfaces": pc.cast(b["s_p_sum"], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    out = counts.join(
        surfaces, join_type="inner", on=("canon",), **join_kwargs(cfg, small=True)
    )
    return out.map_batches(
        lambda b: b.select(["canon", "n_links", "n_pages", "n_surfaces"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ENTITY_DEGREE_SQL = sql_with_pages(
    "SELECT canon,\n"
    "       count(*)::BIGINT AS n_links,\n"
    "       count(DISTINCT url)::BIGINT AS n_pages,\n"
    "       count(DISTINCT surface)::BIGINT AS n_surfaces\n"
    "FROM (SELECT DISTINCT t.url AS url, a.surface AS surface, a.canon AS canon\n"
    "      FROM toks t JOIN aliases a ON a.surface = t.tok)\n"
    "GROUP BY canon",
    QUADS_SQL_CTE,
)


def entity_cooccur(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Entity co-occurrence edges: unordered (canon_a < canon_b) pairs of
    canonical entities mentioned on the SAME page, with the page count per
    pair — the co-mention graph every KG build derives right after entity
    linking (edge weights feed disambiguation and embedding training).

    Distributed shape: ``entity_links`` keeps a page's links inside one
    block, so pair GENERATION is block-local — sort the block's distinct
    (url, canon) rows, then one vectorized repeat/offset construction emits
    every within-page (i < j) pair with no shuffle and no Python loop. A
    per-block C++ groupby combines pairs before the exchange, so only
    |distinct pairs per block| rows cross the wire (bounded by the alias
    dictionary squared, NOT by the corpus), and one ``bucket_aggregate``
    sums the partials. Hot pairs (popular entity combinations) are pure
    count accumulation — no per-key state, no skew blowup; pages mentioning
    k entities emit C(k,2) <= C(|dict|,2) pairs, so a boilerplate page
    cannot explode a block.
    """
    from virtuoso_quad_log_ray.numerics import hash128 as _h128
    from virtuoso_quad_log_ray.stages.shuffle import bucket_aggregate

    links = entity_links(sf_dir, cfg)

    def pair_partial(b: pa.Table) -> pa.Table:
        # distinct (url, canon) within the block (drop multi-surface repeats),
        # sorted so each page's canons are contiguous and ascending
        d = (
            b.select(["url", "canon"])
            .group_by(["url", "canon"])
            .aggregate([])
            .sort_by([("url", "ascending"), ("canon", "ascending")])
        )
        n = len(d)
        empty = pa.table(
            {
                "canon_a": pa.array([], type=pa.string()),
                "canon_b": pa.array([], type=pa.string()),
                "h1": pa.array([], type=pa.int64()),
                "n_pages": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        url = d["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        codes = url.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        group_id = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        local = np.arange(n, dtype=np.int64) - starts[group_id]
        reps = sizes[group_id] - 1 - local  # pairs led by each row
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        run_start = np.cumsum(reps) - reps
        offset = np.arange(total, dtype=np.int64) - np.repeat(run_start, reps) + 1
        b_idx = a_idx + offset
        canon = d["canon"]
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        pairs = pa.table(
            {
                "canon_a": pc.take(canon, pa.array(a_idx)),
                "canon_b": pc.take(canon, pa.array(b_idx)),
            }
        )
        part = pairs.group_by(["canon_a", "canon_b"]).aggregate([("canon_a", "count")])
        key = pc.binary_join_element_wise(part["canon_a"], part["canon_b"], "\x1f")
        h1, _ = _h128(key)
        return pa.table(
            {
                "canon_a": part["canon_a"],
                "canon_b": part["canon_b"],
                "h1": pa.array(h1),
                "n_pages": pc.cast(part["canon_a_count"], pa.int64()),
            }
        )

    # batch_size=None: whole blocks (the repo convention — pages.py,
    # extract_text.py). pair_partial is only correct if ALL of a page's
    # link rows arrive in ONE batch; entity_links emits each page's links
    # inside one block, and batch_size=None makes that the batch boundary
    # too. An explicit batch_size (or a future Ray default change) could
    # split a page across batches and silently drop cross-split pairs
    # (ADVICE r4).
    partials = links.map_batches(
        pair_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = bucket_aggregate(
        partials, ["canon_a", "canon_b"], [("n_pages", "sum")], hash_col="h1"
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "canon_a": b["canon_a"],
                "canon_b": b["canon_b"],
                "n_pages": pc.cast(b["n_pages_sum"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ENTITY_COOCCUR_SQL = sql_with_pages(
    "SELECT a.canon AS canon_a, b.canon AS canon_b, count(*)::BIGINT AS n_pages\n"
    "FROM mentions a JOIN mentions b ON a.url = b.url AND a.canon < b.canon\n"
    "GROUP BY 1, 2",
    QUADS_SQL_CTE,
)


def entity_pagerank(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    iters: int = 20,
    damping: float = 0.85,
    **kwargs,
) -> ray.data.Dataset:
    """Entity salience: weighted PageRank over the co-occurrence graph —
    the node-importance score a KG build attaches to each canonical entity
    (disambiguation priors, salience-weighted page sampling). Rows-only on
    the driver (an iterative fixpoint is not ANSI-SQL-expressible); pinned
    in pytest against an independent dense power iteration and against the
    forced-distributed path. See ``stages/graph.py`` for the scale shape.
    """
    from virtuoso_quad_log_ray.stages.graph import pagerank

    ranks = pagerank(
        entity_cooccur(sf_dir, cfg),
        cfg,
        a_col="canon_a",
        b_col="canon_b",
        weight_col="n_pages",
        iters=iters,
        damping=damping,
        **kwargs,
    )
    return ranks.map_batches(
        lambda b: pa.table({"canon": b["node"], "rank": b["rank"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def rdfpatch_lines(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """M1-M4 surface: fully rendered `+ s p o <g> .` patch lines
    (vql_create_nquad, utils.sql:23-30)."""
    from virtuoso_quad_log_ray.rdfpatch import render_patch_lines

    quads = build_quads(sf_dir, cfg)

    def render(batch: pa.Table) -> pa.Table:
        n = len(batch)
        op = pa.array(["+"] * n, type=pa.string())
        line = render_patch_lines(op, batch["s"], batch["p"], batch["o"], batch["g"])
        return pa.table({"line": line})

    return quads.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)


RDFPATCH_LINES_SQL = sql_with_pages(
    "SELECT '+ ' || s || ' ' || p || ' ' || o || ' <' || g || '> .' AS line FROM quads",
    QUADS_SQL_CTE,
)

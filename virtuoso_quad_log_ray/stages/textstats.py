"""Text analysis stages over the pages/documents corpus.

Training-data-pipeline operators (brief: language-ID, quality scoring, token
counting, document fingerprinting), each a stateless or actor-pool
``map_batches`` over Arrow batches. Ratio metrics are reported as integer
ppm (round(x*1e6)) so value-hash comparison is float-format-proof.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig
from virtuoso_quad_log_ray.numerics import half_away_int64, hash128 as _h128
from virtuoso_quad_log_ray.sources.pages import PAGES_SQL_CTE, read_pages
from virtuoso_quad_log_ray.stages.shuffle import actor_kwargs

STOPWORDS = ("the", "a")


def text_quality(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Per-page quality stats: token count, char count, mean token length,
    stopword ratio, distinct-token ratio (all vectorized Arrow kernels +
    one Arrow hash group_by per batch for the distinct count)."""
    pages = read_pages(sf_dir, include_html=False)
    stop_arr = pa.array(list(STOPWORDS), type=pa.string())

    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tokens = pc.split_pattern(text, " ")
        n_tokens = pc.list_value_length(tokens).to_numpy().astype(np.int64)
        n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)

        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy()
        n = len(batch)
        # per-row stopword count: bincount over parent indices of hits
        stop_hits = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        stop_count = np.bincount(parents[stop_hits], minlength=n).astype(np.int64)
        # per-row distinct tokens: Arrow hash group_by on (row, token), then bincount
        distinct_rows = (
            pa.table({"i": pa.array(parents), "tok": flat}).group_by(["i", "tok"]).aggregate([])
        )
        distinct_count = np.bincount(
            distinct_rows["i"].to_numpy().astype(np.int64), minlength=n
        ).astype(np.int64)

        with np.errstate(divide="ignore", invalid="ignore"):
            mean_tok_len = np.where(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens, 0.0)
            stop_ratio = np.where(n_tokens > 0, stop_count / n_tokens, 0.0)
            distinct_ratio = np.where(n_tokens > 0, distinct_count / n_tokens, 0.0)
        return pa.table(
            {
                "url": batch["url"],
                "n_tokens": pa.array(n_tokens),
                "n_chars": pa.array(n_chars),
                # half-away rounding matches DuckDB round(); np.round is
                # banker's and flips exact-.5 values (ADVICE r1)
                "mean_token_len_ppm": pa.array(half_away_int64(mean_tok_len * 1e6)),
                "stopword_ratio_ppm": pa.array(half_away_int64(stop_ratio * 1e6)),
                "distinct_ratio_ppm": pa.array(half_away_int64(distinct_ratio * 1e6)),
            }
        )

    return pages.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


TEXT_QUALITY_SQL = (
    "WITH " + PAGES_SQL_CTE + ",\n"
    "base AS (SELECT url, text, string_split(text, ' ') AS w FROM pages)\n"
    "SELECT url,\n"
    "       len(w)::BIGINT AS n_tokens,\n"
    "       length(text)::BIGINT AS n_chars,\n"
    "       CAST(round(1e6 * (length(text) - (len(w) - 1)) / len(w)) AS BIGINT) AS mean_token_len_ppm,\n"
    "       CAST(round(1e6 * len(list_filter(w, t -> t IN ('the', 'a'))) / len(w)) AS BIGINT) AS stopword_ratio_ppm,\n"
    "       CAST(round(1e6 * len(list_distinct(w)) / len(w)) AS BIGINT) AS distinct_ratio_ppm\n"
    "FROM base"
)


def fingerprints(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Content fingerprint per page (md5 here; MinHash/SimHash sketches live
    in stages/dedup.py). Keyed digest matches DuckDB's md5() for the oracle;
    production (oracle_mode=False) emits the vectorized 128-bit engine hash
    as 32-char hex instead — same shape, no per-row Python (r4 #4)."""
    from virtuoso_quad_log_ray.numerics import fsb_hex, hash128_fsb

    pages = read_pages(sf_dir, include_html=False)

    def fp(batch: pa.Table) -> pa.Table:
        # md5 is pinned by the oracle so hashing stays in hashlib, but
        # dictionary-encode first: clone/mirror pages repeat byte-identical
        # texts, so each unique document hashes ONCE per batch
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        d = text.dictionary_encode()
        if not cfg.oracle_mode:
            uniq_hex = fsb_hex(hash128_fsb(d.dictionary))
            return pa.table(
                {"url": batch["url"], "fingerprint": pc.take(uniq_hex, d.indices)}
            )
        uniq_digests = np.array(
            [hashlib.md5(t.encode()).hexdigest() for t in d.dictionary.to_pylist()]
        )
        digests = uniq_digests[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        return pa.table(
            {"url": batch["url"], "fingerprint": pa.array(digests, type=pa.string())}
        )

    return pages.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


FINGERPRINTS_SQL = "WITH " + PAGES_SQL_CTE + "\nSELECT url, md5(text) AS fingerprint FROM pages"


# BPE-ish tokenization: letter runs, digit runs, and single punctuation marks
# each count as one token (the usual pre-tokenizer regex shape). Both Arrow
# and DuckDB run RE2, so counts agree exactly.
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Per-page token counts: whitespace tokens + BPE-ish regex tokens
    (training-data pipeline budget accounting). Fully vectorized."""
    pages = read_pages(sf_dir, include_html=False)

    def counts(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ws = pc.list_value_length(pc.split_pattern(text, " "))
        bpe = pc.count_substring_regex(text, _BPE_PATTERN)
        return pa.table(
            {
                "url": batch["url"],
                "n_ws_tokens": pc.cast(ws, pa.int64()),
                "n_bpe_tokens": pc.cast(bpe, pa.int64()),
            }
        )

    return pages.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)


TOKEN_COUNTS_SQL = (
    "WITH " + PAGES_SQL_CTE + "\n"
    "SELECT url,\n"
    "       len(string_split(text, ' '))::BIGINT AS n_ws_tokens,\n"
    f"       len(regexp_extract_all(text, '{_BPE_PATTERN}'))::BIGINT AS n_bpe_tokens\n"
    "FROM pages"
)


# PII redaction (C4/RefinedWeb-style corpus scrubbing): emails, simple
# US-style phone numbers, IPv4 addresses -> typed placeholder tokens.
# Patterns are RE2 on BOTH sides (Arrow's replace_substring_regex and
# DuckDB's regexp_replace both run RE2), applied in declared order, so
# engine and oracle rewrite identically byte for byte.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_batch(text: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """(clean_text, n_pii) for a text column — fully vectorized: one
    count + one replace kernel per pattern, no Python per row. Counts are
    taken per pattern on the ORIGINAL text (match DuckDB oracle)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # Null guard (ADVICE r3): count_substring_regex(null) -> null -> NaN ->
    # platform-dependent garbage through astype(int64). Fill nulls with ''
    # (0 matches, '' clean text) — the SQL oracle coalesces identically.
    if text.null_count:
        text = pc.fill_null(text, "")
    n_pii = np.zeros(len(text), dtype=np.int64)
    clean = text
    for pattern, token in PII_PATTERNS:
        n_pii += pc.count_substring_regex(text, pattern).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        clean = pc.replace_substring_regex(clean, pattern, token)
    return clean, pa.array(n_pii)


def redact_pii(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Per-page PII scrub: (url, clean_text, n_pii). A corpus-prep stage a
    training pipeline runs before tokenization; stateless vectorized
    map_batches, streams at any scale."""
    pages = read_pages(sf_dir, include_html=False)

    def scrub(batch: pa.Table) -> pa.Table:
        clean, n_pii = redact_batch(batch["text"])
        return pa.table({"url": batch["url"], "clean_text": clean, "n_pii": n_pii})

    return pages.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def _pii_sql() -> str:
    # coalesce matches redact_batch's null fill: both sides emit ('', 0)
    # for a null text row (ADVICE r3 engine/oracle null parity)
    clean = "coalesce(text, '')"
    counts = []
    for pattern, token in PII_PATTERNS:
        esc = pattern.replace("'", "''")
        counts.append(f"len(regexp_extract_all(coalesce(text, ''), '{esc}'))")
        clean = f"regexp_replace({clean}, '{esc}', '{token}', 'g')"
    return (
        "WITH " + PAGES_SQL_CTE + "\n"
        f"SELECT url, {clean} AS clean_text,\n"
        f"       CAST({' + '.join(counts)} AS BIGINT) AS n_pii\n"
        "FROM pages"
    )


REDACT_PII_SQL = _pii_sql()


# Context-window chunking: fixed token windows per document — the prep step
# a training pipeline runs to fit documents into a model's context length.
CHUNK_TOKENS = 64  # whitespace tokens per chunk (non-overlapping)


def text_chunks(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG, *, chunk_tokens: int = CHUNK_TOKENS
) -> ray.data.Dataset:
    """Per-page fixed-token-window chunks: one row per chunk with
    (url, chunk_idx, start_tok, n_toks, chunk_text). Fully vectorized:
    token offsets come from the split ListArray's offsets buffer; the 1->N
    fan-out is numpy repeat; each chunk's text is ONE ``binary_join`` over
    a ListArray view of the flat token array (split+join on the same
    separator is lossless, so chunk texts concatenate back to the page).

    Scale shape: stateless map_batches, no shuffle — chunking 10^12 docs
    streams block by block."""
    pages = read_pages(sf_dir, include_html=False)

    def chunk(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # null parity with the SQL oracle (ADVICE r3): a null text row is
        # treated as '' on both sides -> one chunk of one empty token
        if text.null_count:
            text = pc.fill_null(text, "")
        tokens = pc.split_pattern(text, " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.flatten()  # honors the list offsets
        n = len(tokens)
        tok_offs = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_offs = tok_offs - tok_offs[0]  # slice-safe base
        n_toks = np.diff(tok_offs)
        n_chunks = np.maximum(1, -(-n_toks // chunk_tokens))  # ceil, min 1
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        row_start = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        chunk_idx = np.arange(total, dtype=np.int64) - row_start
        start_tok = chunk_idx * chunk_tokens
        tok_lo = tok_offs[doc_idx] + start_tok
        tok_hi = np.minimum(tok_lo + chunk_tokens, tok_offs[doc_idx + 1])
        # gather flat[lo:hi) for every chunk into one contiguous token
        # array, wrap it as a ListArray (one list per chunk), join with " "
        gathered = _slices(flat, tok_lo, tok_hi)
        lens = tok_hi - tok_lo
        piece_offsets = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(lens)]
        ).astype(np.int32)
        pieces = pa.ListArray.from_arrays(
            pa.array(piece_offsets, type=pa.int32()), gathered
        )
        chunk_text = pc.binary_join(pieces, " ")
        return pa.table(
            {
                "url": pc.take(batch["url"], pa.array(doc_idx)),
                "chunk_idx": pa.array(chunk_idx),
                "start_tok": pa.array(start_tok),
                "n_toks": pa.array(tok_hi - tok_lo),
                "chunk_text": chunk_text,
            }
        )

    return pages.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


def _slices(flat: pa.Array, lo: "np.ndarray", hi: "np.ndarray") -> pa.Array:
    """Gather flat[lo[i]:hi[i]] for every i into one contiguous array
    (vectorized fancy-index; the per-chunk list wrapper is built by the
    caller from the run lengths)."""
    lens = hi - lo
    pos = (
        np.arange(int(lens.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
        + np.repeat(lo, lens)
    )
    return flat.take(pa.array(pos))


def text_chunks_sql(chunk_tokens: int = CHUNK_TOKENS) -> str:
    k = chunk_tokens
    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "b AS (SELECT url, string_split(coalesce(text, ''), ' ') AS w FROM pages),\n"
        "c AS (\n"
        "    SELECT url, w, unnest(range(0, greatest(1, CAST(ceil("
        f"len(w) / {k}.0) AS BIGINT)))) AS ci\n"
        "    FROM b\n"
        ")\n"
        "SELECT url, CAST(ci AS BIGINT) AS chunk_idx,\n"
        f"       CAST(ci * {k} AS BIGINT) AS start_tok,\n"
        f"       CAST(least((ci + 1) * {k}, len(w)) - ci * {k} AS BIGINT) AS n_toks,\n"
        f"       array_to_string(list_slice(w, ci * {k} + 1, least((ci + 1) * {k}, len(w))), ' ') AS chunk_text\n"
        "FROM c"
    )


TEXT_CHUNKS_SQL = text_chunks_sql()


# Quality-gate thresholds (a Gopher/C4-style keep/drop rule, frozen so the
# oracle can reproduce it).
MIN_TOKENS = 20
MAX_MEAN_TOKEN_LEN_PPM = 12_000_000  # mean token length <= 12 chars
MIN_DISTINCT_RATIO_PPM = 300_000  # >= 30% distinct tokens


def corpus_filter(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Composite quality gate over the per-page stats: keep pages with
    enough tokens, sane mean token length, and lexical diversity — the
    C4/Gopher-rule shape every training-data pipeline applies before
    tokenization. Pure filter over text_quality's vectorized metrics."""
    stats = text_quality(sf_dir, cfg)

    def gate(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(b["n_tokens"], MIN_TOKENS),
                pc.less_equal(b["mean_token_len_ppm"], MAX_MEAN_TOKEN_LEN_PPM),
            ),
            pc.greater_equal(b["distinct_ratio_ppm"], MIN_DISTINCT_RATIO_PPM),
        )
        return b.filter(keep).select(["url", "n_tokens"])

    return stats.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


CORPUS_FILTER_SQL = (
    "SELECT url, n_tokens FROM (\n"
    + TEXT_QUALITY_SQL
    + f"\n) WHERE n_tokens >= {MIN_TOKENS}"
    f" AND mean_token_len_ppm <= {MAX_MEAN_TOKEN_LEN_PPM}"
    f" AND distinct_ratio_ppm >= {MIN_DISTINCT_RATIO_PPM}"
)


def corpus_stats_by_lang(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Per-language corpus accounting: pages, total/mean tokens, total
    chars — the budget table a multilingual pipeline reports per shard.
    Pre-aggregated per block before the tiny groupby(lang) shuffle."""
    from ray.data.aggregate import Count, Sum

    pages = read_pages(sf_dir, include_html=False)

    def prep(b: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(b["text"], " ")
        return pa.table(
            {
                "lang": b["lang"],
                "n_tokens": pc.cast(pc.list_value_length(tokens), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
            }
        )

    agg = (
        pages.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Count(), Sum("n_tokens"), Sum("n_chars"))
    )

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b["lang"],
                "n_pages": pc.cast(b["count()"], pa.int64()),
                "total_tokens": pc.cast(b["sum(n_tokens)"], pa.int64()),
                "total_chars": pc.cast(b["sum(n_chars)"], pa.int64()),
            }
        )

    return agg.map_batches(shape, batch_format="pyarrow", zero_copy_batch=True)


CORPUS_STATS_BY_LANG_SQL = (
    "WITH " + PAGES_SQL_CTE + "\n"
    "SELECT lang, count(*) AS n_pages,\n"
    "       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,\n"
    "       sum(length(text))::BIGINT AS total_chars\n"
    "FROM pages GROUP BY lang"
)


def shard_plan(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG, *, n_shards: int = 16
) -> ray.data.Dataset:
    """Deterministic output sharding: shard = md5(url) prefix mod n — the
    content-addressed assignment a training pipeline uses to split a corpus
    into stable, resumable shards (same layout idea as the adjacency
    buckets, pipelines/materialize.py). Exactly reproducible in SQL."""
    pages = read_pages(sf_dir, include_html=False)

    def assign(b: pa.Table) -> pa.Table:
        shards = _url_key_int(b["url"], cfg) % n_shards
        return pa.table(
            {"url": b["url"], "shard": pa.array(shards, type=pa.int64())}
        )

    return pages.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def shard_plan_sql(n_shards: int = 16) -> str:
    return (
        "WITH " + PAGES_SQL_CTE + "\n"
        "SELECT url,\n"
        f"       CAST(CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % {n_shards} AS BIGINT) AS shard\n"
        "FROM pages"
    )


def corpus_curate(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG, *, n_shards: int = 16
) -> ray.data.Dataset:
    """The end-to-end curation flagship a training-data pipeline runs:
    quality gate -> exact dedup (keep-first by url) -> content-addressed
    shard assignment, composed as ONE streaming pass plus ONE key-sized
    exchange.

    Distributed shape: a single map over pages computes the gate metrics
    (the corpus_filter predicate, same ppm rounding as the oracle) AND the
    128-bit content key, filtering in-block — rejected pages never leave
    their block, and only (k1, k2, url, n_tokens) rows (~40 bytes) cross
    the one ``bucket_aggregate`` exchange, where min(url)/min(n_tokens)
    per content key IS the keep-first dedup (identical texts agree on
    n_tokens). Shard assignment is a pure per-row map on the survivors.
    """
    from virtuoso_quad_log_ray.numerics import hash128 as _h128

    pages = read_pages(sf_dir, include_html=False)
    from virtuoso_quad_log_ray.stages.shuffle import bucket_aggregate

    def gate_and_key(b: pa.Table) -> pa.Table:
        text = b["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tokens = pc.split_pattern(text, " ")
        n_tokens = pc.list_value_length(tokens).to_numpy().astype(np.int64)
        n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)
        parents = pc.list_parent_indices(tokens).to_numpy()
        distinct_rows = (
            pa.table({"i": pa.array(parents), "tok": pc.list_flatten(tokens)})
            .group_by(["i", "tok"])
            .aggregate([])
        )
        distinct_count = np.bincount(
            distinct_rows["i"].to_numpy().astype(np.int64), minlength=len(b)
        ).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mtl_ppm = half_away_int64(
                np.where(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens, 0.0) * 1e6
            )
            dr_ppm = half_away_int64(
                np.where(n_tokens > 0, distinct_count / n_tokens, 0.0) * 1e6
            )
        keep = (
            (n_tokens >= MIN_TOKENS)
            & (mtl_ppm <= MAX_MEAN_TOKEN_LEN_PPM)
            & (dr_ppm >= MIN_DISTINCT_RATIO_PPM)
        )
        k1, k2 = _h128(text)
        return pa.table(
            {
                "k1": pa.array(k1),
                "k2": pa.array(k2),
                "url": b["url"],
                "n_tokens": pa.array(n_tokens),
            }
        ).filter(pa.array(keep))

    keyed = pages.map_batches(gate_and_key, batch_format="pyarrow", zero_copy_batch=True)
    kept = bucket_aggregate(
        keyed, ["k1", "k2"], [("url", "min"), ("n_tokens", "min")], hash_col="k1"
    )

    def assign(b: pa.Table) -> pa.Table:
        shards = _url_key_int(b["url_min"], cfg) % n_shards
        return pa.table(
            {
                "url": b["url_min"],
                "n_tokens": pc.cast(b["n_tokens_min"], pa.int64()),
                "shard": pa.array(shards, type=pa.int64()),
            }
        )

    return kept.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def corpus_curate_sql(n_shards: int = 16) -> str:
    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "base AS (SELECT url, text, string_split(text, ' ') AS w FROM pages),\n"
        "q AS (SELECT url, text, len(w)::BIGINT AS n_tokens,\n"
        "      CAST(round(1e6 * (length(text) - (len(w) - 1)) / len(w)) AS BIGINT) AS mtl,\n"
        "      CAST(round(1e6 * len(list_distinct(w)) / len(w)) AS BIGINT) AS dr\n"
        "      FROM base),\n"
        f"gated AS (SELECT url, text, n_tokens FROM q WHERE n_tokens >= {MIN_TOKENS}\n"
        f"          AND mtl <= {MAX_MEAN_TOKEN_LEN_PPM} AND dr >= {MIN_DISTINCT_RATIO_PPM}),\n"
        "kept AS (SELECT min(url) AS url, min(n_tokens) AS n_tokens FROM gated GROUP BY text)\n"
        "SELECT url, n_tokens,\n"
        f"       CAST(CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % {n_shards} AS BIGINT) AS shard\n"
        "FROM kept"
    )


WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 16  # winnowing window


def winnow_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """DuckDB analog of :func:`winnow_fingerprints` — the same rolling
    Rabin-Karp base-257 hash mod 2**64 (HUGEINT arithmetic, UBIGINT result),
    per-window minima via a frame-bounded window function, short-document
    global minima, then per-url distinct + count + bit_xor.

    The Ray path hashes UTF-8 BYTES while ``ord(substr(...))`` hashes code
    points; they coincide exactly on the ASCII sandbox corpus (asserted by
    the oracle gate itself — any non-ASCII text would surface as a value
    mismatch, not silent drift).
    """
    mod = 1 << 64
    powers = [pow(257, e, mod) for e in range(k)]
    terms = " + ".join(
        f"CAST(lead(b,{j}) OVER w AS HUGEINT) * {powers[k - 1 - j]}"
        if j
        else f"CAST(b AS HUGEINT) * {powers[k - 1]}"
        for j in range(k)
    )
    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "chars AS (\n"
        "  SELECT url, u.i AS i, ord(substr(text, CAST(u.i AS INT), 1)) AS b,\n"
        "         length(text) AS len\n"
        "  FROM pages, unnest(generate_series(1, length(text))) AS u(i)),\n"
        "kg AS (\n"
        f"  SELECT url, i, len - {k - 1} AS m,\n"
        f"    CAST(({terms}) % {mod} AS UBIGINT) AS h\n"
        "  FROM chars\n"
        "  WINDOW w AS (PARTITION BY url ORDER BY i)\n"
        f"  QUALIFY i <= len - {k - 1}),\n"
        "wins AS (\n"
        "  SELECT url, min(h) OVER (PARTITION BY url ORDER BY i\n"
        f"    ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mh\n"
        "  FROM kg\n"
        f"  QUALIFY i <= m - {w - 1}),\n"
        f"shorts AS (SELECT url, min(h) AS mh FROM kg WHERE m <= {w} GROUP BY url),\n"
        "sel AS (SELECT DISTINCT url, mh\n"
        "        FROM (SELECT * FROM wins UNION ALL SELECT * FROM shorts)),\n"
        "agg AS (SELECT url, count(*) AS n_fingerprints, bit_xor(mh) AS fp_xor\n"
        "        FROM sel GROUP BY url)\n"
        "SELECT p.url AS url, coalesce(a.n_fingerprints, 0) AS n_fingerprints,\n"
        "       CAST(coalesce(a.fp_xor, 0) AS UBIGINT) AS fp_xor\n"
        "FROM pages p LEFT JOIN agg a ON p.url = a.url"
    )



def winnow_fingerprints(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): rolling
    Rabin-Karp hash over char k-grams, keep the min hash of each sliding
    window -> a sparse, position-robust fingerprint set per document.

    Output: (url, n_fingerprints, fp_xor) — the selected-hash count and
    their XOR (an order-free digest of the set), deterministic. Vectorized
    over the WHOLE BATCH: one rolling-hash pass over the concatenated UTF-8
    buffer (cross-document k-grams masked out), one strided-view window
    minimum, one global (doc, hash) distinct + segment XOR — no per-document
    Python loop. Oracle: :func:`winnow_sql` (same hash in HUGEINT SQL).
    """
    pages = read_pages(sf_dir, include_html=False)

    def fp(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_docs = len(text)
        if n_docs == 0:
            return pa.table(
                {
                    "url": batch["url"],
                    "n_fingerprints": pa.array([], type=pa.int64()),
                    "fp_xor": pa.array([], type=pa.uint64()),
                }
            )
        # WHOLE-BATCH vectorization over the concatenated UTF-8 buffer (no
        # per-document Python loop): rolling hashes for every k-gram
        # position, invalid cross-document k-grams masked to uint64-max so
        # they never win a window minimum, per-window minima from one
        # strided view, then one global (doc, hash) unique + segment XOR.
        offs = np.frombuffer(text.buffers()[1], dtype=np.int32)[
            text.offset : text.offset + n_docs + 1
        ].astype(np.int64)
        data = np.frombuffer(text.buffers()[2], dtype=np.uint8)[
            offs[0] : offs[-1]
        ].astype(np.uint64)
        offs = offs - offs[0]
        lengths = np.diff(offs)
        total = len(data)
        K, W = WINNOW_K, WINNOW_W
        MAXU = np.uint64(0xFFFFFFFFFFFFFFFF)
        m_tot = total - K + 1
        sel_doc_parts, sel_hash_parts = [], []
        if m_tot >= 1:
            doc_of_byte = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
            h = np.zeros(m_tot, dtype=np.uint64)
            for j in range(K):
                coef = np.uint64(pow(257, K - 1 - j, 1 << 64))
                h += data[j : j + m_tot] * coef
            # k-gram valid iff it does not cross a document boundary
            kg_doc = doc_of_byte[:m_tot]
            kg_valid = kg_doc == doc_of_byte[K - 1 : K - 1 + m_tot]
            h = np.where(kg_valid, h, MAXU)
            if m_tot >= W:
                win = np.lib.stride_tricks.sliding_window_view(h, W)
                # window valid iff first and last k-gram are valid AND in
                # the same document (then every k-gram between is too)
                first_d, last_d = kg_doc[: m_tot - W + 1], kg_doc[W - 1 :]
                w_valid = (
                    (first_d == last_d)
                    & kg_valid[: m_tot - W + 1]
                    & kg_valid[W - 1 :]
                )
                if w_valid.any():
                    sel_doc_parts.append(first_d[w_valid])
                    sel_hash_parts.append(win.min(axis=1)[w_valid])
            # short docs (1 <= m_doc <= W): no full window fits — the
            # selected set is the doc's single global minimum
            m_doc = lengths - K + 1
            short = np.flatnonzero((m_doc >= 1) & (m_doc <= W))
            if len(short):
                # per-doc min over that doc's k-gram range via reduceat
                starts = offs[short]
                # gather each short doc's h segment min (segments are small)
                mins = np.array(
                    [h[s : s + m].min() for s, m in zip(starts, m_doc[short])],
                    dtype=np.uint64,
                )
                ok = mins != MAXU
                sel_doc_parts.append(short[ok])
                sel_hash_parts.append(mins[ok])
        out_n = np.zeros(n_docs, dtype=np.int64)
        out_xor = np.zeros(n_docs, dtype=np.uint64)
        if sel_doc_parts:
            sd = np.concatenate(sel_doc_parts)
            sh = np.concatenate(sel_hash_parts)
            # global distinct (doc, hash) then per-doc count + XOR
            order = np.lexsort((sh, sd))
            sd, sh = sd[order], sh[order]
            keep = np.ones(len(sd), dtype=bool)
            keep[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
            sd, sh = sd[keep], sh[keep]
            present, starts_ = np.unique(sd, return_index=True)
            out_n[present] = np.diff(np.append(starts_, len(sd)))
            out_xor[present] = np.bitwise_xor.reduceat(sh, starts_)
        return pa.table(
            {
                "url": batch["url"],
                "n_fingerprints": pa.array(out_n),
                "fp_xor": pa.array(out_xor, type=pa.uint64()),
            }
        )

    return pages.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# language ID: corpus-trained byte-trigram profiles, broadcast + score
# ---------------------------------------------------------------------------

_TRI_SPACE = 1 << 24  # trigram id space: 3 UTF-8 bytes packed into 24 bits


def _packed_trigrams(text_col) -> tuple[np.ndarray, np.ndarray]:
    """String column -> (doc_idx, packed) trigram arrays, whole-batch
    vectorized over the concatenated UTF-8 buffer (same zero-copy buffer
    walk as the winnowing stage). Trigram unit = BYTES (identical to code
    points on ASCII; a deliberate, documented simplification elsewhere)."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    n_docs = len(text_col)
    offs = np.frombuffer(text_col.buffers()[1], dtype=np.int32)[
        text_col.offset : text_col.offset + n_docs + 1
    ].astype(np.int64)
    data = np.frombuffer(text_col.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    offs = offs - offs[0]
    total = len(data)
    m = total - 2
    if m < 1:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    d = data.astype(np.int64)
    packed = (d[:m] << 16) | (d[1 : m + 1] << 8) | d[2 : m + 2]
    doc_of_byte = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offs))
    doc = doc_of_byte[:m]
    valid = doc == doc_of_byte[2 : m + 2]  # trigram within one document
    return doc[valid], packed[valid]


LANG_HEAD_BYTES = 300  # score on the first N bytes of each document


class LangScorer:
    """Actor-pool stage scoring pages against broadcast per-language trigram
    profiles (model broadcast once via ray.put, loaded per actor).

    Fully vectorized end to end: trigram ids come from the packed-byte
    helper (one buffer pass per batch) mapped through a direct-addressed
    2^24 lookup table built once per actor; scoring is one gather of every
    trigram's (vocab x langs) log-prob row + one add.reduceat per document
    + argmax — no Python loop over documents, trigrams, or languages.
    """

    def __init__(self, profiles_ref):
        profiles: dict[str, dict[int, int]] = ray.get(profiles_ref)
        self._langs = sorted(profiles)
        vocab: dict[int, int] = {}
        for lang in self._langs:
            for tri in profiles[lang]:
                vocab.setdefault(tri, len(vocab))
        totals = [sum(profiles[l].values()) + 1 for l in self._langs]
        self._floor = np.array([np.log(1 / t) for t in totals])
        # matrix row per trigram (+1 smoothing; unseen = per-lang floor)
        m = np.tile(self._floor, (len(vocab), 1))
        for li, lang in enumerate(self._langs):
            t = totals[li]
            for tri, v in profiles[lang].items():
                m[vocab[tri], li] = np.log((v + 1) / t)
        # extra floor row for out-of-vocab trigrams (index len(vocab))
        self._m = np.vstack([m, self._floor[None, :]])
        oov = len(vocab)
        # direct-addressed packed-trigram -> vocab row LUT (2^24 int32,
        # 64 MB once per actor): turns id assembly into one numpy gather
        lut = np.full(_TRI_SPACE, oov, dtype=np.int32)
        if vocab:
            keys = np.fromiter(vocab.keys(), dtype=np.int64, count=len(vocab))
            vals = np.fromiter(vocab.values(), dtype=np.int32, count=len(vocab))
            lut[keys] = vals
        self._lut = lut

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = len(batch)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        heads = pc.binary_slice(pc.cast(text, pa.binary()), 0, LANG_HEAD_BYTES)
        if isinstance(heads, pa.ChunkedArray):
            heads = heads.combine_chunks()
        doc, packed = _packed_trigrams(heads)
        if len(doc) == 0:
            preds = pa.array(["und"] * n_docs, type=pa.string())
            return pa.table({"url": batch["url"], "lang_pred": preds})
        ids = self._lut[packed]
        rows = self._m[ids]  # (n_tris, L)
        # docs are contiguous in `doc` (buffer order); zero sentinel row
        # keeps a trailing empty doc's reduceat bound valid
        rows = np.vstack([rows, np.zeros((1, rows.shape[1]))])
        present, starts = np.unique(doc, return_index=True)
        scores = np.add.reduceat(rows, starts, axis=0)
        best = np.argmax(scores, axis=1)
        lang_arr = np.array(self._langs, dtype=object)
        preds = np.full(n_docs, "und", dtype=object)
        preds[present] = lang_arr[best]
        return pa.table(
            {"url": batch["url"], "lang_pred": pa.array(preds.tolist(), type=pa.string())}
        )


def lang_id(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Two-phase language ID: (1) train per-lang trigram profiles with a
    small groupby-aggregate over the labeled corpus, (2) broadcast the model
    and score every page in an actor pool. Deterministic; no oracle SQL (the
    heuristic is not SQL-expressible) — driver records rows-only."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])

    def per_block(batch: pa.Table) -> pa.Table:
        # whole-block vectorized trigram counting: pack every in-document
        # byte trigram to 24 bits, join the doc's language code, and count
        # (lang, trigram) pairs with one np.unique — no Python loop over
        # documents or characters (the trainer touches EVERY corpus byte,
        # so a scalar loop here dominates at scale)
        lang_col = batch["lang"]
        if isinstance(lang_col, pa.ChunkedArray):
            lang_col = lang_col.combine_chunks()
        enc = lang_col.dictionary_encode()
        lang_idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lang_names = enc.dictionary
        doc, packed = _packed_trigrams(batch["text"])
        if len(doc) == 0:
            return pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "tri": pa.array([], type=pa.int64()),
                    "th": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        key = lang_idx[doc] * _TRI_SPACE + packed
        uniq, counts = np.unique(key, return_counts=True)
        # "th": uniformly-mixed bucket hash of the trigram (the raw packed
        # value clusters in ASCII ranges, so tri % n_buckets would skew)
        th = ((uniq % _TRI_SPACE).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(
            np.int64
        )
        return pa.table(
            {
                "lang": pc.take(lang_names, pa.array(uniq // _TRI_SPACE)),
                "tri": pa.array(uniq % _TRI_SPACE),
                "th": pa.array(th),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    # partial counts per block -> one small groupby (model fits the driver)

    from virtuoso_quad_log_ray.stages.shuffle import bucket_aggregate

    counts = bucket_aggregate(
        docs.map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "tri"],
        [("n", "sum")],
        hash_col="th",
    ).take_all()
    profiles: dict[str, dict[int, int]] = {}
    for row in counts:
        profiles.setdefault(row["lang"], {})[int(row["tri"])] = int(row["n_sum"])
    profiles_ref = ray.put(profiles)

    pages = read_pages(sf_dir, include_html=False)
    return pages.map_batches(
        LangScorer,
        fn_constructor_kwargs={"profiles_ref": profiles_ref},
        **actor_kwargs(batch_size=1024),
    )


# ---------------------------------------------------------------------------
# stratified sampling + train/eval decontamination
# ---------------------------------------------------------------------------

def _url_key_int(
    urls: pa.Array | pa.ChunkedArray, cfg: EngineConfig = DEFAULT_CONFIG
) -> np.ndarray:
    """Content-addressed int64 selector in [0, 2^32) per url — shared by
    every deterministic-sampling/sharding op.

    oracle_mode (default): first 4 digest bytes of md5(url), matching the
    SQL oracle ``CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT)``
    byte-for-byte — a per-row Python loop by oracle-pinned necessity.
    production (cfg.oracle_mode=False): the vectorized 128-bit hash folded
    to the same range — no per-row Python (VERDICT r4 #4). Both are
    deterministic and uniform; selections differ between modes."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if not cfg.oracle_mode:
        h1, _ = _h128(urls)
        return (h1.view(np.uint64) >> np.uint64(32)).astype(np.int64)
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(u.encode()).digest()[:4], "big")
            for u in urls.to_pylist()
        ),
        dtype=np.int64,
        count=len(urls),
    )


SAMPLE_RATES_PERMILLE = {"en": 500, "zh": 800}
SAMPLE_DEFAULT_PERMILLE = 1000


def sample_stratified(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    rates: dict[str, int] | None = None,
) -> ray.data.Dataset:
    """Deterministic per-language downsampling: keep a page iff
    ``md5(url) % 1000 < rate_permille[lang]`` — the standard rebalancing
    step of a multilingual pretraining mix (downsample overrepresented
    languages, keep the tail whole). Content-addressed, so the sample is
    stable across runs, resumes, and cluster sizes — no RNG state to
    coordinate. Pure streaming map, no shuffle at any scale.

    Output: (url, lang) of the kept pages."""
    rates = SAMPLE_RATES_PERMILLE if rates is None else rates
    langs = pa.array(list(rates.keys()), type=pa.string())
    rate_arr = np.fromiter(rates.values(), dtype=np.int64, count=len(rates))

    pages = read_pages(sf_dir, include_html=False)

    def keep(b: pa.Table) -> pa.Table:
        sel = _url_key_int(b["url"], cfg) % 1000
        li = pc.index_in(b["lang"], value_set=langs)
        li_np = li.to_numpy(zero_copy_only=False)
        row_rate = np.where(
            np.isnan(li_np.astype(np.float64)),
            SAMPLE_DEFAULT_PERMILLE,
            rate_arr[np.nan_to_num(li_np).astype(np.int64)],
        )
        return pa.table({"url": b["url"], "lang": b["lang"]}).filter(
            pa.array(sel < row_rate)
        )

    return pages.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def sample_stratified_sql(rates: dict[str, int] | None = None) -> str:
    rates = SAMPLE_RATES_PERMILLE if rates is None else rates
    case = (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in rates.items())
        + f" ELSE {SAMPLE_DEFAULT_PERMILLE} END"
    )
    return (
        "WITH " + PAGES_SQL_CTE + "\n"
        "SELECT url, lang FROM pages\n"
        f"WHERE CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % 1000 < {case}"
    )


EVAL_SHARDS = 16  # md5-shard 0 of 16 is the held-out eval slice


def contamination(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Train/eval decontamination scan (the GPT-3/Pile n-gram overlap
    check): the corpus' md5-shard 0 is the held-out eval slice; for every
    TRAIN page, report how many of its distinct word shingles appear
    anywhere in the eval slice.

    Distributed shape — no broadcast of the eval set (at 10^12-doc scale
    even an eval slice outgrows a task heap): the compact 16-byte shingle
    table (dedup._shingle_rows) is materialized ONCE and read twice; the
    eval side collapses to distinct shingle keys (bucketed C++ aggregate);
    one left-outer hash join marks each train shingle row hit/miss; a
    bucketed per-url aggregate folds hits into
    ``contam_ppm = round(1e6 * |hit shingles| / |shingles|)``. Every join
    key is the fixed-width 128-bit shingle hash.

    Output: (url, n_shingles, n_contaminated, contam_ppm) for every train
    page with at least one shingle."""
    from virtuoso_quad_log_ray.stages.dedup import _shingle_rows
    from virtuoso_quad_log_ray.stages.shuffle import (
        bucket_aggregate,
        join_kwargs,
        scrub_empty_blocks,
        self_join_input,
    )

    n = cfg.shingle_size

    def keyed(b: pa.Table) -> pa.Table:
        uh = _url_key_int(b["url"], cfg)
        return b.append_column("uh", pa.array(uh)).append_column(
            "shard", pa.array(uh % EVAL_SHARDS)
        )

    rows = self_join_input(
        _shingle_rows(sf_dir, n).map_batches(
            keyed, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    _EMPTY = pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "n_shingles": pa.array([], type=pa.int64()),
            "n_contaminated": pa.array([], type=pa.int64()),
            "contam_ppm": pa.array([], type=pa.int64()),
        }
    )
    if rows.count() == 0:
        return ray.data.from_arrow(_EMPTY)

    def only(shard_eq: bool):
        def f(b: pa.Table) -> pa.Table:
            mask = pc.equal(b["shard"], 0)
            return b.filter(mask if shard_eq else pc.invert(mask))

        return f

    eval_rows = rows.map_batches(only(True), batch_format="pyarrow", zero_copy_batch=True)
    train = rows.map_batches(only(False), batch_format="pyarrow", zero_copy_batch=True)

    # eval_keys feeds the left_outer hash join below: scrub the
    # sort-shuffle's schemaless empty blocks (eval-shingle-set-sized; the
    # count() guard below materializes anyway)
    eval_keys = scrub_empty_blocks(
        bucket_aggregate(eval_rows, ["s1", "s2"], [("url", "count")], hash_col="s1")
    ).map_batches(
        lambda b: pa.table(
            {
                "s1": b["s1"],
                "s2": b["s2"],
                "hit": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def finalize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _EMPTY
        size = b["size_min"].to_numpy(zero_copy_only=False).astype(np.int64)
        cont = (
            pc.fill_null(b["hit_sum"], 0).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "url": b["url"],
                "n_shingles": pa.array(size),
                "n_contaminated": pa.array(cont),
                "contam_ppm": pa.array(half_away_int64(1e6 * cont / size)),
            }
        )

    if eval_keys.count() == 0:
        # no eval pages shingled -> every train page is trivially clean
        per_url = bucket_aggregate(
            train, ["url"], [("size", "min")], hash_col="uh"
        )
        return per_url.map_batches(
            lambda b: pa.table(
                {
                    "url": b["url"],
                    "n_shingles": pc.cast(b["size_min"], pa.int64()),
                    "n_contaminated": pa.array(np.zeros(len(b), dtype=np.int64)),
                    "contam_ppm": pa.array(np.zeros(len(b), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    joined = train.join(
        eval_keys,
        join_type="left_outer",
        on=("s1", "s2"),
        **join_kwargs(cfg),
    )
    per_url = bucket_aggregate(
        joined, ["url"], [("size", "min"), ("hit", "sum")], hash_col="uh"
    )
    return per_url.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def contamination_sql(shingle_size: int | None = None) -> str:
    n = shingle_size if shingle_size is not None else DEFAULT_CONFIG.shingle_size
    gram = " || ' ' || ".join(f"w[i+{k}]" if k else "w[i]" for k in range(n))
    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "shingled AS (\n"
        "    SELECT url, list_distinct(list_transform(\n"
        f"        range(1, len(w) - {n - 2}), i -> {gram})) AS sh\n"
        "    FROM (SELECT url, string_split(text, ' ') AS w FROM pages)\n"
        "),\n"
        "sets AS (\n"
        "    SELECT url, len(sh) AS size, unnest(sh) AS shingle,\n"
        f"           CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % {EVAL_SHARDS} AS shard\n"
        "    FROM shingled\n"
        "),\n"
        "eval_sh AS (SELECT DISTINCT shingle FROM sets WHERE shard = 0),\n"
        "train AS (SELECT * FROM sets WHERE shard <> 0)\n"
        "SELECT t.url,\n"
        "       min(t.size) AS n_shingles,\n"
        "       count(e.shingle) AS n_contaminated,\n"
        "       CAST(round(1e6 * count(e.shingle) / min(t.size)) AS BIGINT) AS contam_ppm\n"
        "FROM train t LEFT JOIN eval_sh e ON t.shingle = e.shingle\n"
        "GROUP BY t.url"
    )


# ---------------------------------------------------------------------------
# context-window packing plan (concat-and-chunk pretraining packing)
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 256
PACK_SHARDS = 16


def pack_plan(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    budget: int = PACK_BUDGET_TOKENS,
    n_shards: int = PACK_SHARDS,
) -> ray.data.Dataset:
    """Concat-and-chunk packing plan: within each md5 shard, documents are
    laid end-to-end in url order and each doc is assigned to the training
    bin its FIRST token falls in (``bin_id = start_offset // budget``) —
    the standard pretraining packing layout (docs concatenated, stream cut
    into fixed windows), as a deterministic plan table.

    Distributed shape: the heavy part (token counting) is a streaming
    map over text blocks; the plan rows that reach the per-shard prefix
    scan are METADATA (url + two ints, no text), so a shard group of
    |corpus|/n_shards rows is orders of magnitude smaller than the corpus
    — size ``n_shards`` so a group's plan rows fit a task (the same dial
    as the adjacency buckets, pipelines/materialize.py). Per-shard scan =
    one C++ sort + one numpy cumsum.

    Output: (url, shard, n_tokens, bin_id)."""
    pages = read_pages(sf_dir, include_html=False)

    def counted(b: pa.Table) -> pa.Table:
        uh = _url_key_int(b["url"], cfg)
        return pa.table(
            {
                "url": b["url"],
                "shard": pa.array(uh % n_shards),
                "n_tokens": pc.cast(
                    pc.list_value_length(pc.split_pattern(b["text"], " ")), pa.int64()
                ),
            }
        )

    def scan(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group["url"])
        g = group.take(order)
        ntok = g["n_tokens"].to_numpy(zero_copy_only=False)
        start = np.cumsum(ntok) - ntok  # exclusive prefix sum = start offset
        return pa.table(
            {
                "url": g["url"],
                "shard": g["shard"],
                "n_tokens": g["n_tokens"],
                "bin_id": pa.array(start // budget),
            }
        )

    return (
        pages.map_batches(counted, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(scan, batch_format="pyarrow")
    )


def pack_plan_sql(budget: int = PACK_BUDGET_TOKENS, n_shards: int = PACK_SHARDS) -> str:
    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "counted AS (\n"
        "    SELECT url,\n"
        f"           CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % {n_shards} AS shard,\n"
        "           len(string_split(text, ' '))::BIGINT AS n_tokens\n"
        "    FROM pages\n"
        ")\n"
        "SELECT url, shard, n_tokens,\n"
        "       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY url) - n_tokens)\n"
        f"            / {budget}) AS BIGINT) AS bin_id\n"
        "FROM counted"
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style "repetitious document" filters)
# ---------------------------------------------------------------------------

def text_repetition(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Per-page repetition signals for quality filtering (the Gopher /
    MassiveText "repetitious text" family): the occurrence count of the
    single most frequent word and the number of duplicate word-2-gram
    occurrences (occurrences beyond the first of each distinct 2-gram).
    Reported as raw integer counts alongside ``n_words`` so downstream
    gates can form whatever ratio they filter on, float-format-proof.

    Fully vectorized and embarrassingly parallel (a page never splits
    across batches): tokens via ``split_pattern``, per-(row, word) counts
    via one Arrow C++ hash group_by per batch, 2-grams rendered by joining
    the flattened token array against itself shifted by one (valid where
    both tokens share a parent row) — no Python loop over rows or tokens.
    """
    pages = read_pages(sf_dir, include_html=False)

    def rep(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(batch)
        tokens = pc.split_pattern(text, " ")
        n_words = pc.list_value_length(tokens).to_numpy().astype(np.int64)
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy().astype(np.int64)

        # most-frequent-word count per row: C++ hash group_by, then a
        # scatter-max over the group rows
        wc = (
            pa.table({"i": pa.array(parents), "tok": flat})
            .group_by(["i", "tok"])
            .aggregate([("tok", "count")])
        )
        top_word_n = np.zeros(n, dtype=np.int64)
        np.maximum.at(
            top_word_n,
            wc["i"].to_numpy().astype(np.int64),
            wc["tok_count"].to_numpy().astype(np.int64),
        )

        # duplicate 2-gram occurrences: adjacent-token pairs within a row
        m = len(flat)
        if m >= 2:
            left, right = flat.slice(0, m - 1), flat.slice(1, m - 1)
            same_row = parents[:-1] == parents[1:]
            grams = pc.binary_join_element_wise(left, right, "\x1f")
            gt = pa.table(
                {
                    "i": pa.array(parents[:-1][same_row]),
                    "g": pc.filter(grams, pa.array(same_row)),
                }
            )
            distinct = np.bincount(
                gt.group_by(["i", "g"]).aggregate([])["i"].to_numpy().astype(np.int64),
                minlength=n,
            )
            total = np.bincount(gt["i"].to_numpy().astype(np.int64), minlength=n)
            dup_2gram_n = (total - distinct).astype(np.int64)
        else:
            dup_2gram_n = np.zeros(n, dtype=np.int64)

        return pa.table(
            {
                "url": batch["url"],
                "n_words": pa.array(n_words),
                "top_word_n": pa.array(top_word_n),
                "dup_2gram_n": pa.array(dup_2gram_n),
            }
        )

    return pages.map_batches(rep, batch_format="pyarrow", zero_copy_batch=True)


TEXT_REPETITION_SQL = (
    "WITH " + PAGES_SQL_CTE + ",\n"
    "base AS (SELECT url, string_split(text, ' ') AS w FROM pages),\n"
    "wc AS (\n"
    "    SELECT url, word, count(*) AS c\n"
    "    FROM (SELECT url, unnest(w) AS word FROM base) GROUP BY url, word\n"
    "),\n"
    "per_word AS (SELECT url, max(c)::BIGINT AS top_word_n FROM wc GROUP BY url),\n"
    "grams AS (\n"
    "    SELECT url,\n"
    "           list_transform(range(1, len(w)), i -> w[i] || chr(31) || w[i + 1]) AS tg\n"
    "    FROM base\n"
    ")\n"
    "SELECT b.url,\n"
    "       len(b.w)::BIGINT AS n_words,\n"
    "       p.top_word_n,\n"
    "       (len(g.tg) - len(list_distinct(g.tg)))::BIGINT AS dup_2gram_n\n"
    "FROM base b JOIN per_word p ON b.url = p.url JOIN grams g ON b.url = g.url"
)


# ---------------------------------------------------------------------------
# TF-IDF top terms (keyword extraction over the corpus)
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_top_terms(
    sf_dir: str, k: int = TFIDF_TOP_K, cfg: EngineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Top-k characteristic terms per page, ranked tf-idf-style but with an
    INTEGER ordering key — tf descending, document frequency ascending
    (rarer corpus-wide wins ties), then term — so the ranking is exactly
    reproducible in SQL with no float-comparison hazards. The composition
    showcase: per-batch TF, distributed DF, one term-keyed hash join, and
    the partial-top-k combiner, each stage already scale-proven elsewhere
    in the engine.

    Distributed shape (no stage materializes the corpus):
      1. TF is EXACT per batch — a page never splits across blocks, so one
         C++ hash group_by per batch yields (url, term, tf) with no shuffle.
      2. DF partials per block (each (url, term) appears once, so a per-term
         row count IS the block's document frequency), summed by a bucketed
         C++ aggregate — only |block vocab| rows per block cross the wire.
      3. TF joins DF on the term (distributed hash join; the vocabulary is
         never broadcast — at web scale DF tables outgrow any driver).
      4. Per-block partial top-k per url (<= k rows per url per block leave
         the block), then a per-url final merge re-ranks k x |blocks| rows.
    """
    pages = read_pages(sf_dir, include_html=False)
    from virtuoso_quad_log_ray.numerics import hash128 as _h128
    from virtuoso_quad_log_ray.stages.shuffle import (
        bucket_aggregate,
        join_kwargs,
        scrub_empty_blocks,
    )

    def tf_batch(b: pa.Table) -> pa.Table:
        text = b["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tokens = pc.split_pattern(text, " ")
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens)
        g = (
            pa.table({"i": parents, "term": flat})
            .group_by(["i", "term"])
            .aggregate([("term", "count")])
        )
        return pa.table(
            {
                "url": pc.take(b["url"], g["i"]),
                "term": g["term"],
                "tf": pc.cast(g["term_count"], pa.int64()),
            }
        )

    tf = pages.map_batches(tf_batch, batch_format="pyarrow", zero_copy_batch=True)

    def df_partial(b: pa.Table) -> pa.Table:
        g = b.select(["term"]).group_by(["term"]).aggregate([("term", "count")])
        h1, _ = _h128(g["term"])
        return pa.table(
            {
                "term": g["term"],
                "h1": pa.array(h1),
                "dfp": pc.cast(g["term_count"], pa.int64()),
            }
        )

    # df feeds the term-keyed hash join below: scrub the sort-shuffle's
    # schemaless empty blocks (vocabulary-sized materialize; they crashed
    # the join with "No match for key field term" at sf0.1 / 32 CPUs where
    # the synthetic vocab occupies fewer buckets than the aggregate has)
    df = scrub_empty_blocks(
        bucket_aggregate(
            tf.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["term"],
            [("dfp", "sum")],
            hash_col="h1",
        )
    ).map_batches(
        lambda b: pa.table({"term": b["term"], "df": pc.cast(b["dfp_sum"], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    joined = tf.join(df, join_type="inner", on=("term",), **join_kwargs(cfg))

    sort_keys = [("tf", "descending"), ("df", "ascending"), ("term", "ascending")]

    def topk_block(b: pa.Table) -> pa.Table:
        t = b.select(["url", "term", "tf", "df"])
        t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")] + sort_keys))
        u = t["url"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        run_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        rank = np.arange(len(u)) - starts[run_id]
        return t.filter(pa.array(rank < k))

    partial = joined.map_batches(topk_block, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        t = t.slice(0, min(k, len(t)))
        return t.append_column("rank", pa.array(np.arange(1, len(t) + 1)))

    return partial.groupby("url").map_groups(final_topk, batch_format="pyarrow")


def tfidf_top_terms_sql(k: int = TFIDF_TOP_K) -> str:
    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "words AS (SELECT url, unnest(string_split(text, ' ')) AS term FROM pages),\n"
        "tf AS (SELECT url, term, count(*)::BIGINT AS tf FROM words GROUP BY url, term),\n"
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)\n"
        "SELECT url, term, tf, df, rank FROM (\n"
        "    SELECT t.url, t.term, t.tf, d.df,\n"
        "           row_number() OVER (\n"
        "               PARTITION BY t.url ORDER BY t.tf DESC, d.df ASC, t.term\n"
        "           ) AS rank\n"
        "    FROM tf t JOIN df d USING (term)\n"
        f") WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle into training shards
# ---------------------------------------------------------------------------

SHUFFLE_SHARDS = 8
SHUFFLE_SEED = "r4"


def shuffle_shards(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    n_shards: int = SHUFFLE_SHARDS,
    seed: str = SHUFFLE_SEED,
) -> ray.data.Dataset:
    """Deterministic corpus shuffle into training shards: every page gets a
    shard id and a 1-based POSITION inside that shard, both derived only
    from md5(url || '#' || seed) — the data-ordering step before LLM
    training (epoch order must be pseudo-random, reproducible from the seed
    alone, and stable across cluster sizes/resumes; ``ds.random_shuffle``
    gives none of those). Changing the seed reshuffles; re-running does not.

    Distributed shape: the one legitimate all-to-all here is the global
    sort by (shard, hashkey) — a total order is the OUTPUT, not an
    implementation choice. Ranking over the sorted blocks is the
    zip-with-index pattern of ``canonicalize._rank_nodes``: per-block row
    counts and per-block (shard, first-rank) minima — metadata, a few ints
    per block — come back to the driver, a cumsum/min turns them into
    offsets, and one tiny task per block appends offset+arange. Block
    payloads never touch the driver. md5 is a per-row Python loop by
    oracle-pinned necessity in oracle_mode; production (oracle_mode=False)
    keys on the vectorized 128-bit hash of the salted url instead
    (VERDICT r4 #4) — a different (equally uniform, deterministic)
    permutation with no per-row Python.

    Output: (url, shard, pos) with pos = ROW_NUMBER() within shard ordered
    by the salted hash key.
    """
    pages = read_pages(sf_dir, include_html=False)

    def key(b: pa.Table) -> pa.Table:
        urls = b["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        if not cfg.oracle_mode:
            salted = pc.binary_join_element_wise(urls, f"#{seed}", "")
            h1, _ = _h128(salted)
            ku = h1.view(np.uint64)
            return pa.table(
                {
                    "url": urls,
                    "shard": pa.array(
                        ((ku >> np.uint64(32)) % np.uint64(n_shards)).astype(np.int64)
                    ),
                    "k": pa.array(ku),
                }
            )
        hexes = [
            hashlib.md5(f"{u}#{seed}".encode()).hexdigest() for u in urls.to_pylist()
        ]
        shard = np.fromiter(
            (int(h[:8], 16) % n_shards for h in hexes), dtype=np.int64, count=len(hexes)
        )
        return pa.table(
            {
                "url": urls,
                "shard": pa.array(shard),
                "k": pa.array(hexes, type=pa.string()),
            }
        )

    sorted_ds = (
        pages.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["shard", "k", "url"])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _meta(t: pa.Table) -> tuple:
        """(row count, per-shard first local index) — metadata only."""
        if t.num_rows == 0:  # empty sort partitions carry no schema
            return 0, {}
        sh = t["shard"].to_numpy(zero_copy_only=False)
        firsts = {}
        change = np.flatnonzero(np.diff(sh, prepend=sh[0] - 1 if len(sh) else 0))
        for i in change:
            firsts[int(sh[i])] = int(i)
        return t.num_rows, firsts

    @ray.remote(num_cpus=0.25)
    def _with_pos(t: pa.Table, off: int, starts: dict) -> pa.Table:
        sh = t["shard"].to_numpy(zero_copy_only=False)
        grank = np.arange(off, off + t.num_rows, dtype=np.int64)
        start_arr = np.fromiter(
            (starts[int(s)] for s in sh), dtype=np.int64, count=len(sh)
        )
        return pa.table(
            {
                "url": t["url"],
                "shard": t["shard"],
                "pos": pa.array(grank - start_arr + 1),
            }
        )

    metas = ray.get([_meta.remote(r) for r in refs])
    counts = [m[0] for m in metas]
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])]) if counts else []
    # global first-rank per shard (min over blocks of block_offset + local)
    starts: dict[int, int] = {}
    for (n, firsts), off in zip(metas, offsets):
        for s, li in firsts.items():
            g = int(off) + li
            if s not in starts or g < starts[s]:
                starts[s] = g
    return ray.data.from_arrow_refs(
        [
            _with_pos.remote(r, int(o), starts)
            for r, o, n in zip(refs, offsets, counts)
            if n
        ]
    )


def shuffle_shards_sql(
    n_shards: int = SHUFFLE_SHARDS, seed: str = SHUFFLE_SEED
) -> str:
    h = f"md5(url || '#{seed}')"
    shard = f"CAST(('0x' || substr({h}, 1, 8)) AS BIGINT) % {n_shards}"
    return (
        "WITH " + PAGES_SQL_CTE + "\n"
        f"SELECT url, {shard} AS shard,\n"
        f"  ROW_NUMBER() OVER (PARTITION BY {shard} ORDER BY {h}) AS pos\n"
        "FROM pages"
    )


def curate_to_jsonl(
    sf_dir: str,
    out_root: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    n_shards: int = 16,
    epoch: str,
):
    """Curation flagship -> delivery: run ``corpus_curate`` (gate ->
    exact-dedup keep-first -> shard plan), join the surviving urls back to
    their page rows (ONE hash join on url — the curated set is the small
    side at any scale where curation rejects anything), and ship the result
    as committed JSONL shards via ``write_jsonl_corpus``. Returns the sink
    manifest; record count == curated-set size by construction.
    """
    from virtuoso_quad_log_ray.sources.pages import read_pages, write_jsonl_corpus
    from virtuoso_quad_log_ray.stages.shuffle import join_kwargs, scrub_empty_blocks

    curated = scrub_empty_blocks(
        corpus_curate(sf_dir, cfg, n_shards=n_shards).map_batches(
            lambda b: b.select(["url"]), batch_format="pyarrow", zero_copy_batch=True
        )
    )
    pages = read_pages(sf_dir, include_html=False)
    kept = pages.join(curated, join_type="inner", on=("url",), **join_kwargs(cfg))
    return write_jsonl_corpus(kept, out_root, epoch=epoch)


SAMPLE_GROUP_K = 25


def sample_group_k(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    k: int = SAMPLE_GROUP_K,
) -> ray.data.Dataset:
    """Deterministic fixed-k sample per language: the k pages with the
    smallest md5(url) in each lang, with their 1-based sample rank — the
    "give me k examples per group" eval-set builder (content-addressed, so
    stable across runs, resumes and cluster sizes; rate-based
    ``sample_stratified`` cannot promise an exact k).

    Distributed shape: grouped top-k with a map-side combiner — each block
    keeps at most k rows per lang (one vectorized sort + run-length cut,
    no Python loop), so the exchange carries <= k * |langs| rows per block;
    one tiny per-lang map_groups merge re-sorts and ranks. md5 is per-row
    Python by oracle-pinned necessity (the shard_plan residual).
    """
    pages = read_pages(sf_dir, include_html=False)

    def partial(b: pa.Table) -> pa.Table:
        urls = b["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        if not cfg.oracle_mode:  # vectorized key on the scale path (r4 #4)
            hk = pa.array(_h128(urls)[0].view(np.uint64))
        else:
            hk = pa.array(
                [hashlib.md5(u.encode()).hexdigest() for u in urls.to_pylist()],
                type=pa.string(),
            )
        t = pa.table({"lang": b["lang"], "url": urls, "hk": hk}).sort_by(
            [("lang", "ascending"), ("hk", "ascending"), ("url", "ascending")]
        )
        codes = t["lang"].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        n = len(codes)
        if n == 0:
            return t
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(change)
        group_id = np.cumsum(change) - 1
        local = np.arange(n, dtype=np.int64) - starts[group_id]
        return t.filter(pa.array(local < k))

    def merge(group: pa.Table) -> pa.Table:
        t = group.sort_by([("hk", "ascending"), ("url", "ascending")]).slice(0, k)
        return pa.table(
            {
                "lang": t["lang"],
                "url": t["url"],
                "rn": pa.array(np.arange(1, len(t) + 1, dtype=np.int64)),
            }
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(merge, batch_format="pyarrow")
    )


def sample_group_k_sql(k: int = SAMPLE_GROUP_K) -> str:
    return (
        "WITH " + PAGES_SQL_CTE + "\n"
        "SELECT lang, url, rn FROM (\n"
        "  SELECT lang, url,\n"
        "         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(url), url) AS rn\n"
        "  FROM pages)\n"
        f"WHERE rn <= {k}"
    )

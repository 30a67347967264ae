"""Mergeable sketches: HyperLogLog distinct counting over a keyed stream.

The training-data brief's "novel sketch" slot: cardinality estimation is
the sketch a 100 TB pipeline needs constantly (distinct urls per shard,
distinct users per event type, vocabulary sizes) where exact distinct is
an all-to-all shuffle. HLL is mergeable, so the distributed shape is the
ideal combiner pattern:

  map_batches  -> ONE row per (key, block): the block's 2^p uint8 register
                  blob (numpy scatter-max, fully vectorized)
  groupby(key) -> np.maximum.reduce over the few per-block blobs
  finalize     -> the standard HLL estimator (+ linear-counting small-range
                  correction) on register counts

Only |keys| x 2^p bytes ever cross the shuffle — corpus size never does.
Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (2007); no reference-repo analog (the reference has
no sketches — this is new-engine capability).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig

HLL_P = 12  # 2^12 = 4096 registers, ~1.6% standard error
_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (splitmix64 finalizer) — vectorized,
    dependency-free, stable across processes and versions (unlike seeded
    library hashes; ADVICE r2 made that property load-bearing)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _clz_rank(w: np.ndarray, width: int) -> np.ndarray:
    """rank (HLL rho) of a value left-aligned in a 64-bit word: number of
    leading zeros of the 64-bit word + 1, with an all-zero value mapping to
    width + 1. Vectorized 6-step binary highest-set-bit."""
    w = w.astype(np.uint64, copy=True)
    shift = 32
    acc = np.zeros(len(w), dtype=np.int64)
    cur = w.copy()
    while shift:
        high = cur >> np.uint64(shift)
        has = high > 0
        acc = np.where(has, acc + shift, acc)
        cur = np.where(has, high, cur)
        shift //= 2
    pos = acc + 1  # bit_length of the 64-bit word (w > 0)
    return np.where(w > 0, 64 - pos + 1, width + 1).astype(np.int64)


def _registers(hashes: np.ndarray) -> np.ndarray:
    """64-bit hashes -> 2^p uint8 register maxima (one pass, vectorized)."""
    return _keyed_registers(hashes, np.zeros(len(hashes), dtype=np.int64), 1)[0]


def _keyed_registers(
    hashes: np.ndarray, key_idx: np.ndarray, n_keys: int
) -> np.ndarray:
    """(n_keys, 2^p) uint8 register maxima for key-tagged hashes — ONE
    ``np.maximum.at`` scatter on a (key_idx * 2^p + register) grid, no
    per-key Python loop (VERDICT r3 #4). Grid memory is n_keys x 4 KB of
    uint8; for keys of corpus cardinality (where even that dense grid is
    too big per block) the alternative is a sparse partial — emit the
    (key, register, rank) triples and groupby-max — at the cost of a wider
    shuffle row; the dense blob keeps the shuffle at |keys| x 4 KB."""
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = hashes << np.uint64(HLL_P)  # drops the index bits, keeps 64-p value
    rank = _clz_rank(w, 64 - HLL_P).astype(np.uint8)  # rank <= 64 fits uint8
    grid = np.zeros(n_keys * _M, dtype=np.uint8)
    np.maximum.at(grid, key_idx * _M + idx, rank)
    return grid.reshape(n_keys, _M)


def _estimate(regs: np.ndarray) -> int:
    from virtuoso_quad_log_ray.numerics import half_away_int64

    m = float(_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:  # linear-counting small-range correction
        est = m * np.log(m / zeros)
    # half-away rounding = DuckDB round(), so the SQL oracle
    # (events_distinct_users_sql) agrees even on an exact .5 estimate
    # (Python round() is banker's and would emit the even neighbor)
    return int(half_away_int64(np.array([est]))[0])


def hll_distinct(
    ds: ray.data.Dataset, key_col: str, value_col: str
) -> ray.data.Dataset:
    """(key, approx_distinct) — approximate distinct ``value_col`` (int64)
    per ``key_col`` via per-block HLL register blobs merged by max."""

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "key": pa.array([], type=pa.string()),
                    "regs": pa.array([], type=pa.binary()),
                }
            )
        keys = b[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(vals.view(np.uint64))
        enc = keys.dictionary_encode()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk = len(enc.dictionary)
        # one vectorized scatter for ALL keys (VERDICT r3 #4) and one
        # zero-copy binary wrap of the flat grid — no per-key Python
        grid = _keyed_registers(h, kidx, nk)
        offsets = (np.arange(nk + 1, dtype=np.int64) * _M).astype(np.int32)
        regs_arr = pa.BinaryArray.from_buffers(
            pa.binary(),
            nk,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(grid.tobytes())],
        )
        return pa.table(
            {
                "key": pa.array(enc.dictionary.to_pylist(), type=pa.string()),
                "regs": regs_arr,
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        blobs = group["regs"]
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        mat = np.stack(
            [np.frombuffer(v.as_py(), dtype=np.uint8) for v in blobs]
        )
        merged = np.maximum.reduce(mat, axis=0)
        return pa.table(
            {
                "key": pa.array([group["key"][0].as_py()], type=pa.string()),
                "approx_distinct": pa.array([_estimate(merged)], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .map_groups(merge, batch_format="pyarrow")
    )


def _sql_mulmod64(expr: str, c: int) -> str:
    """UBIGINT-cast wrapper over the shared ``numerics.sql_mulmod64``
    fragment (one home for the 32-bit-split wraparound contract)."""
    from virtuoso_quad_log_ray.numerics import sql_mulmod64

    return f"CAST({sql_mulmod64(expr, c)} AS UBIGINT)"


def events_distinct_users_sql() -> str:
    """DuckDB re-derivation of the EXACT same HLL sketch: splitmix64 in
    modular HUGEINT arithmetic, register index/rank via ``bin()`` length
    (clz), per-(key, register) max, and the identical estimator with the
    identical operation order (the register sum is reconstructed exactly as
    an integer — every ``2**-reg`` term is a power of two, so
    ``sum(2**(64-reg)) / 2**64`` is the true value numpy's pairwise float
    sum approximates to within an ulp; the final int64 round absorbs that).
    The approximation itself is value-checked, not just bounded: both sides
    must produce the same estimate, including its error vs the true count.
    Register max over duplicates is idempotent, so hashing DISTINCT
    (key, user_id) is exact, not a shortcut."""
    m64 = 1 << 64
    m = _M  # 4096 registers (HLL_P = 12)
    return (
        "WITH vals AS (SELECT DISTINCT event_type AS key, user_id AS v FROM events),\n"
        f"z0 AS (SELECT key, CAST((CAST(v AS HUGEINT) + 11400714819323198485) % {m64} AS UBIGINT) AS z FROM vals),\n"
        f"z1 AS (SELECT key, {_sql_mulmod64('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM z0),\n"
        f"z2 AS (SELECT key, {_sql_mulmod64('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM z1),\n"
        "h AS (SELECT key, xor(z, z >> 31) AS h FROM z2),\n"
        f"w AS (SELECT key, h >> {64 - HLL_P} AS idx,\n"
        f"       CAST((CAST(h AS HUGEINT) * {m}) % {m64} AS UBIGINT) AS w FROM h),\n"
        f"regs AS (SELECT key, idx, max(CASE WHEN w = 0 THEN {64 - HLL_P + 1}\n"
        "                               ELSE 65 - length(bin(w)) END) AS reg\n"
        "         FROM w GROUP BY key, idx),\n"
        "agg AS (SELECT key, count(*) AS n_present,\n"
        "          sum(CAST(power(2.0, 64 - reg) AS HUGEINT)) AS intsum\n"
        "        FROM regs GROUP BY key),\n"
        f"est AS (SELECT key, {m} - n_present AS zeros,\n"
        f"          (0.7213/(1 + 1.079/{float(m)})) * {float(m)} * {float(m)} /\n"
        f"            ((CAST(intsum AS DOUBLE) + CAST({m} - n_present AS DOUBLE) * {float(m64)}) / {float(m64)}) AS raw\n"
        "        FROM agg)\n"
        "SELECT key AS event_type,\n"
        f"  CAST(round(CASE WHEN raw <= 2.5 * {float(m)} AND zeros > 0\n"
        f"                  THEN {float(m)} * ln({float(m)} / zeros) ELSE raw END) AS BIGINT) AS approx_distinct\n"
        "FROM est"
    )


def events_distinct_users(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    """Approximate distinct users per event_type over the events stream.
    Oracle: ``events_distinct_users_sql`` re-derives the sketch itself, so
    the estimate (error included) is value-checked; error bound and
    merge/determinism properties additionally asserted in pytest."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    out = hll_distinct(ev, "event_type", "user_id")
    return out.map_batches(
        lambda b: pa.table(
            {"event_type": b["key"], "approx_distinct": b["approx_distinct"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidates -> exact recount (two passes, EXACT)
# ---------------------------------------------------------------------------

HH_PHI_DEFAULT = 1.0 / 64.0  # exact in binary; engine and oracle agree bit-for-bit


def heavy_hitters(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    phi: float = HH_PHI_DEFAULT,
) -> ray.data.Dataset:
    """Corpus heavy hitters over the pages table — see ``heavy_hitters_over``."""
    from virtuoso_quad_log_ray.sources.pages import read_pages

    return heavy_hitters_over(read_pages(sf_dir, include_html=False), cfg, phi=phi)


def heavy_hitters_over(
    pages: ray.data.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    phi: float = HH_PHI_DEFAULT,
) -> ray.data.Dataset:
    """EXACT corpus heavy hitters with bounded memory: every whitespace
    token whose total occurrence count is >= ceil(phi * total_tokens),
    with its exact count — the vocabulary-pruning / hot-token scan of a
    tokenizer build, runnable at 100 TB because no vocabulary-sized state
    ever concentrates anywhere.

    Classic two-pass shape (Misra-Gries "frequent" + exact recount;
    Agarwal et al., "Mergeable Summaries", PODS'12 for the merge bound):

      pass 1  per block: exact in-block counts (C++ group_by), then
              MG-compress to k = ceil(2/phi) counters by subtracting the
              (k+1)-th largest count — undercount t_b <= n_b/(k+1). Each
              block ships <= k survivor rows plus two meta rows (block
              token total, block undercount). One ``bucket_aggregate``
              sums survivors and meta; since sum(t_b) <= n/(k+1) <=
              phi*n/2, every term with true count >= ceil(phi*n) keeps a
              merged lower bound >= min_count - sum(t_b) > 0 — the
              candidate filter below is a guaranteed SUPERSET, and at most
              n / (min_count - sum_t) <= ~2/phi terms pass it, so the
              driver pulls a k-bounded candidate list, never a vocabulary.
      pass 2  broadcast the candidate terms; per block count ONLY
              candidates (is_in mask + C++ group_by), one k-bounded
              ``bucket_aggregate``, exact HAVING filter.

    Exactness (not an approximation) is what makes this oracle-checkable:
    the driver compares it row-for-row against plain GROUP BY ... HAVING.
    """
    import math

    from virtuoso_quad_log_ray.numerics import hash128 as _h128
    from virtuoso_quad_log_ray.stages.shuffle import bucket_aggregate, scrub_empty_blocks

    k = int(math.ceil(2.0 / phi))

    def _flat_tokens(b: pa.Table) -> pa.Array:
        text = b["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if text.null_count:
            # DROP null rows (SQL NULL semantics — the oracle's
            # unnest(string_split(NULL, ' ')) contributes zero rows);
            # fill_null("") would add one ""-token per null row, shifting
            # n_total/min_count and surfacing "" as a term (ADVICE r4).
            text = text.drop_null()
        return pc.list_flatten(pc.split_pattern(text, " "))

    def mg_partial(b: pa.Table) -> pa.Table:
        flat = _flat_tokens(b)
        n_block = len(flat)
        counts = pa.table({"term": flat}).group_by(["term"]).aggregate(
            [("term", "count")]
        )
        terms = counts["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        c = counts["term_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) > k:
            # (k+1)-th largest count; at most k terms exceed it strictly
            t = int(np.partition(c, len(c) - k - 1)[len(c) - k - 1])
            keep = c > t
            terms = pc.filter(terms, pa.array(keep))
            c = c[keep] - t
        else:
            t = 0
        h1, _ = _h128(terms)
        out = pa.table(
            {
                "kind": pa.array(np.zeros(len(c), dtype=np.int64)),
                "term": terms.cast(pa.string()),
                "h": pa.array(h1),
                "c": pa.array(c),
            }
        )
        meta = pa.table(
            {
                "kind": pa.array([1, 2], type=pa.int64()),
                "term": pa.array(["", ""], type=pa.string()),
                "h": pa.array([1, 2], type=pa.int64()),
                "c": pa.array([n_block, t], type=pa.int64()),
            }
        )
        return pa.concat_tables([out, meta])

    sketch = scrub_empty_blocks(
        bucket_aggregate(
            pages.map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["kind", "term"],
            [("c", "sum")],
            hash_col="h",
        )
    )
    # meta rows: 2 rows -> driver scalars (sketch-sized take, like the
    # k-means partials / trigram model pulls elsewhere in the engine)
    meta_tables = [
        t
        for t in (
            ray.get(r)
            for r in sketch.map_batches(
                lambda b: b.filter(pc.not_equal(b["kind"], 0)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).to_arrow_refs()
        )
        if t.num_columns
    ]
    if not meta_tables:  # empty corpus: no blocks survive the aggregate
        n_total, sum_t = 0, 0
    else:
        meta_t = pa.concat_tables(meta_tables)
        meta = dict(zip(meta_t["kind"].to_pylist(), meta_t["c_sum"].to_pylist()))
        n_total, sum_t = int(meta.get(1, 0)), int(meta.get(2, 0))
    if n_total == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "n_occurrences": pa.array([], type=pa.int64()),
                }
            )
        )
    min_count = int(math.ceil(phi * n_total))
    lb = max(1, min_count - sum_t)

    def cand_filter(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(b["kind"], 0), pc.greater_equal(b["c_sum"], lb))
        return b.filter(mask).select(["term"])

    cand_tables = [
        t
        for t in (
            ray.get(r)
            for r in sketch.map_batches(
                cand_filter, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if t.num_columns
    ]
    if not cand_tables:
        cand_tables = [pa.table({"term": pa.array([], type=pa.string())})]
    cand_t = pa.concat_tables(cand_tables)
    candidates = cand_t["term"].combine_chunks()  # <= ~2/phi terms, k-bounded
    if len(candidates) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "n_occurrences": pa.array([], type=pa.int64()),
                }
            )
        )

    def exact_partial(b: pa.Table) -> pa.Table:
        flat = _flat_tokens(b)
        hits = pc.filter(flat, pc.is_in(flat, value_set=candidates))
        part = pa.table({"term": hits}).group_by(["term"]).aggregate(
            [("term", "count")]
        )
        terms = part["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        h1, _ = _h128(terms)
        return pa.table(
            {
                "term": terms.cast(pa.string()),
                "h": pa.array(h1),
                "c": pc.cast(part["term_count"], pa.int64()),
            }
        )

    exact = bucket_aggregate(
        pages.map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["term"],
        [("c", "sum")],
        hash_col="h",
    )

    def finish(b: pa.Table) -> pa.Table:
        out = b.filter(pc.greater_equal(b["c_sum"], min_count))
        return pa.table(
            {"term": out["term"], "n_occurrences": pc.cast(out["c_sum"], pa.int64())}
        )

    return exact.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def heavy_hitters_sql(phi: float = HH_PHI_DEFAULT) -> str:
    from virtuoso_quad_log_ray.sources.pages import PAGES_SQL_CTE

    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "hh_toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM pages),\n"
        "hh_tot AS (SELECT count(*)::DOUBLE AS n FROM hh_toks)\n"
        "SELECT term, count(*)::BIGINT AS n_occurrences FROM hh_toks GROUP BY term\n"
        f"HAVING count(*) >= (SELECT CAST(ceil({phi!r} * n) AS BIGINT) FROM hh_tot)"
    )

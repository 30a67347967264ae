"""Near/exact document deduplication — the canonicalization layer (D2).

The reference's only dedup is the trx-echo table-id filter
(quad-logger/sql-proc/parse_trx_logs.sql:102-109); at web scale the engine
needs document-level dedup before extraction (north_star: "MinHash-LSH +
union-find canonicalization executed as groupby-aggregate shuffles").

Four operators over the pages table, all shuffle-based and vectorized:

  exact        hash-partition on content digest, keep min(url) per group
  ngram        EXACT word-n-gram Jaccard pairs via a shingle inverted-index
               self-join (the verify stage of any LSH pipeline; has a DuckDB
               oracle)
  minhash-lsh  64-perm MinHash, banded LSH bucketing, candidate pairs
               verified by signature agreement (scale path; rows-only check)
  simhash      64-bit SimHash + 4x16-bit band blocking, Hamming<=k pairs

Skew note (north_rule's named hazard): ultra-frequent shingles create hot
inverted-index buckets whose pair set is quadratic. ``max_shingle_freq``
drops shingles above a document-frequency cap — a standard, documented
approximation (popular boilerplate shingles carry no dedup signal). The
oracle-checked configuration keeps it disabled so results stay exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig
from virtuoso_quad_log_ray.sources.pages import PAGES_SQL_CTE, read_pages
from virtuoso_quad_log_ray.stages.shuffle import actor_kwargs, join_kwargs, self_join_input

_SEP = "\x1f"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_pages_exact(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Exact dedup: one group per distinct text; keeper = min(url).

    The group key is the md5 digest of the text, so the shuffle ships a
    16-byte key + url instead of whole documents; group payloads are tiny
    regardless of document size.
    """
    pages = read_pages(sf_dir, include_html=False)

    def digest(batch: pa.Table) -> pa.Table:
        keys = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"k": pa.array(keys, type=pa.string()), "url": batch["url"]})

    keyed = pages.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
    # Min/Count pre-aggregate per block before the shuffle (no per-group
    # Python loop — map_groups over millions of groups would serialize).
    from ray.data.aggregate import Count, Min

    agg = keyed.groupby("k").aggregate(Min("url"), Count())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "keeper_url": batch["min(url)"],
                "n_copies": pc.cast(batch["count()"], pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


DEDUP_PAGES_EXACT_SQL = (
    "WITH " + PAGES_SQL_CTE + "\n"
    "SELECT min(url) AS keeper_url, count(*) AS n_copies FROM pages GROUP BY text"
)


# ---------------------------------------------------------------------------
# shingles (shared by ngram / minhash)
# ---------------------------------------------------------------------------

def _shingle_rows(sf_dir: str, n: int) -> ray.data.Dataset:
    """pages -> rows (url, shingle, size) where size = |distinct shingles|.

    Fully Arrow-vectorized: tokenize with split_pattern, build n-grams by
    joining the flattened token array against itself at offsets 1..n-1
    (valid where the first and last token share a parent row), then one
    hash group_by for the per-(row, shingle) distinct + per-row counts.
    No Python loop over documents or tokens.
    """
    pages = read_pages(sf_dir, include_html=False)

    def explode(batch: pa.Table) -> pa.Table:
        url = batch["url"]
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        tokens = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(tokens)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(tokens)
        if isinstance(parents, pa.ChunkedArray):
            parents = parents.combine_chunks()
        m = len(flat)
        if m < n:
            return pa.table(
                {
                    "url": pa.array([], type=pa.string()),
                    "shingle": pa.array([], type=pa.string()),
                    "size": pa.array([], type=pa.int64()),
                }
            )
        # windows of n consecutive flat tokens, valid iff endpoints share a row
        views = [flat.slice(k, m - n + 1) for k in range(n)]
        shingles = pc.binary_join_element_wise(*views, " ")
        first_par = parents.slice(0, m - n + 1)
        valid = pc.equal(first_par, parents.slice(n - 1, m - n + 1))
        shingles = pc.filter(shingles, valid)
        par = pc.filter(first_par, valid)
        # distinct (row, shingle) + per-row distinct counts in ONE group_by
        distinct = (
            pa.table({"i": par, "shingle": shingles}).group_by(["i", "shingle"]).aggregate([])
        )
        counts = distinct.group_by(["i"]).aggregate([("shingle", "count")])
        size_by_row = np.zeros(len(batch), dtype=np.int64)
        size_by_row[counts["i"].to_numpy().astype(np.int64)] = counts[
            "shingle_count"
        ].to_numpy()
        idx = distinct["i"]
        return pa.table(
            {
                "url": pc.take(url, idx),
                "shingle": distinct["shingle"],
                "size": pa.array(size_by_row[idx.to_numpy().astype(np.int64)]),
            }
        )

    return pages.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    threshold: float | None = None,
    shingle_size: int | None = None,
    max_shingle_freq: int | None = None,
) -> ray.data.Dataset:
    """EXACT n-gram Jaccard near-dup pairs (url_a < url_b, J >= threshold).

    Inverted-index self-join: (url, shingle, size) ⋈ shingle -> co-occurring
    page pairs; groupby(pair).count() = |intersection| (partial-aggregated
    before the shuffle); J = inter / (size_a + size_b - inter). Sizes ride
    inside the pair key so no second lookup join is needed. Reported
    ``jaccard_ppm`` is an integer (round(J*1e6)) so the value-hash is immune
    to float formatting.
    """
    tau = threshold if threshold is not None else cfg.jaccard_threshold
    n = shingle_size if shingle_size is not None else cfg.shingle_size
    rows = self_join_input(_shingle_rows(sf_dir, n))
    if max_shingle_freq is not None:
        # Hot-key cap (north_rule skew hazard): a boilerplate shingle shared
        # by F documents contributes F^2 join rows. Document frequencies come
        # from a pre-aggregated groupby; the HOT set (freq > cap) is tiny, so
        # it broadcasts into a vectorized is_in filter — no second shuffle.
        # Documented approximation: J is then computed over non-hot shingles
        # only (boilerplate carries no dedup signal); the oracle-checked
        # default keeps the cap disabled so results stay exact.
        freq = rows.groupby("shingle").count()
        hot = freq.map_batches(
            lambda b: b.filter(pc.greater(b["count()"], max_shingle_freq)).select(["shingle"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        hot_set = pa.concat_tables(
            [t for t in (ray.get(r) for r in hot.to_arrow_refs()) if t.num_columns]
        ).combine_chunks()
        hot_ref = ray.put(hot_set["shingle"].combine_chunks())

        def drop_hot(b: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)
            return b.filter(pc.invert(pc.is_in(b["shingle"], value_set=hs)))

        rows = rows.map_batches(drop_hot, batch_format="pyarrow", zero_copy_batch=True)
    joined = rows.join(
        rows,
        join_type="inner",
        on=("shingle",),
        **join_kwargs(cfg),
        left_suffix="_l",
        right_suffix="_r",
    )

    def pair_key(batch: pa.Table) -> pa.Table:
        # size-ratio prune (EXACT, no false negatives): J(A,B) <= min/max of
        # the set sizes, so ratio < tau can never reach the threshold. This
        # drops most candidate rows BEFORE the expensive pair groupby.
        sl = pc.cast(batch["size_l"], pa.float64())
        sr = pc.cast(batch["size_r"], pa.float64())
        ratio_ok = pc.greater_equal(
            pc.min_element_wise(sl, sr), pc.multiply(pc.max_element_wise(sl, sr), tau)
        )
        keep = pc.and_(pc.less(batch["url_l"], batch["url_r"]), ratio_ok)
        b = batch.filter(keep)
        payload = pc.binary_join_element_wise(
            b["url_l"],
            b["url_r"],
            pc.cast(b["size_l"], pa.string()),
            pc.cast(b["size_r"], pa.string()),
            _SEP,
        )
        # group key = 16-byte hash of the payload: the groupby's sort cost
        # scales with key bytes, and the full pair string is ~100 chars.
        # The payload is functionally dependent on the key (collision odds
        # ~2^-128), so it rides along as a Min aggregate.
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        keys = [
            hashlib.blake2b(v.encode(), digest_size=16).hexdigest()
            for v in payload.to_pylist()
        ]
        return pa.table(
            {"pair_h": pa.array(keys, type=pa.string()), "payload": payload}
        )

    from ray.data.aggregate import Count, Min

    pairs = joined.map_batches(pair_key, batch_format="pyarrow", zero_copy_batch=True)
    counted = pairs.groupby("pair_h").aggregate(Count(), Min("payload"))

    def finalize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "url_a": pa.array([], type=pa.string()),
                    "url_b": pa.array([], type=pa.string()),
                    "jaccard_ppm": pa.array([], type=pa.int64()),
                }
            )
        parts = pc.split_pattern(batch["min(payload)"], _SEP)
        url_a = pc.list_element(parts, 0)
        url_b = pc.list_element(parts, 1)
        size_a = pc.cast(pc.list_element(parts, 2), pa.int64()).to_numpy()
        size_b = pc.cast(pc.list_element(parts, 3), pa.int64()).to_numpy()
        inter = batch["count()"].to_numpy()
        j = inter / (size_a + size_b - inter)
        keep = j >= tau
        return pa.table(
            {
                "url_a": pc.filter(url_a, pa.array(keep)),
                "url_b": pc.filter(url_b, pa.array(keep)),
                "jaccard_ppm": pa.array(np.round(j[keep] * 1e6).astype(np.int64)),
            }
        )

    return counted.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_sql(threshold: float, shingle_size: int) -> str:
    n = shingle_size
    return (
        "WITH " + PAGES_SQL_CTE + ",\n"
        "shingled AS (\n"
        "    SELECT url, list_distinct(list_transform(\n"
        f"        range(1, len(w) - {n - 2}), i -> "
        + " || ' ' || ".join(f"w[i+{k}]" if k else "w[i]" for k in range(n))
        + ")) AS sh\n"
        "    FROM (SELECT url, string_split(text, ' ') AS w FROM pages)\n"
        "),\n"
        "sets AS (SELECT url, len(sh) AS size, unnest(sh) AS shingle FROM shingled),\n"
        "pairs AS (\n"
        "    SELECT a.url AS url_a, b.url AS url_b, a.size AS size_a, b.size AS size_b,\n"
        "           count(*) AS inter\n"
        "    FROM sets a JOIN sets b ON a.shingle = b.shingle AND a.url < b.url\n"
        "    GROUP BY 1, 2, 3, 4\n"
        ")\n"
        "SELECT url_a, url_b,\n"
        "       CAST(round(1e6 * inter / (size_a + size_b - inter)) AS BIGINT) AS jaccard_ppm\n"
        "FROM pairs\n"
        f"WHERE inter / (size_a + size_b - inter) >= {threshold}"
    )


# ---------------------------------------------------------------------------
# MinHash-LSH (scale path)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) permutation parameters (seeded, no wall-clock)."""
    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _base_hash(shingle: str) -> int:
    """Stable 8-byte content hash (process-independent, unlike hash())."""
    return int.from_bytes(hashlib.blake2b(shingle.encode(), digest_size=8).digest(), "big")


class MinHashSignatures:
    """Actor-pool stage: pages batch -> (url, sig list<uint64>).

    Permutation parameters are built once per actor in __init__ (stateful
    setup), and a per-actor base-hash cache amortizes repeated shingles.

    Fully vectorized: shingles come from the Arrow offset-join construction
    (same as _shingle_rows), base hashes are computed per UNIQUE shingle
    (dictionary-encoded), and per-document minima over the (shingles x
    perms) matrix use a single argsort + minimum.reduceat — no Python loop
    over documents or shingles in the hot path.
    """

    def __init__(self, num_perm: int, shingle_size: int):
        self._a, self._b = _perm_params(num_perm)
        self._n = shingle_size
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self._n
        n_perm = len(self._a)
        n_docs = len(batch)
        tokens = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(tokens)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(tokens)
        if isinstance(parents, pa.ChunkedArray):
            parents = parents.combine_chunks()
        m = len(flat)
        sig_mat = np.zeros((n_docs, n_perm), dtype=np.uint64)
        if m >= n:
            views = [flat.slice(k, m - n + 1) for k in range(n)]
            shingles = pc.binary_join_element_wise(*views, " ")
            first_par = parents.slice(0, m - n + 1)
            valid = pc.equal(first_par, parents.slice(n - 1, m - n + 1))
            shingles = pc.filter(shingles, valid)
            par = pc.filter(first_par, valid)
            distinct = (
                pa.table({"i": par, "sh": shingles}).group_by(["i", "sh"]).aggregate([])
            )
            # base hash per UNIQUE shingle only (per-actor cache)
            enc = pc.dictionary_encode(distinct["sh"].combine_chunks())
            uniq = enc.dictionary.to_pylist()
            cache = self._cache
            uniq_h = np.fromiter(
                (cache.setdefault(s, _base_hash(s)) for s in uniq),
                dtype=np.uint64,
                count=len(uniq),
            )
            base = uniq_h[enc.indices.to_numpy().astype(np.int64)]
            doc_idx = distinct["i"].to_numpy().astype(np.int64)
            order = np.argsort(doc_idx, kind="stable")
            base, doc_idx = base[order], doc_idx[order]
            # (rows x perms) hash matrix, then segment-min per document
            prod = (base[:, None] * self._a[None, :] + self._b[None, :]) % _MERSENNE
            present, starts = np.unique(doc_idx, return_index=True)
            sig_mat[present] = np.minimum.reduceat(prod, starts, axis=0)
        return pa.table(
            {
                "url": batch["url"],
                "sig": pa.array(sig_mat.tolist(), type=pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_pairs(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    threshold: float | None = None,
) -> ray.data.Dataset:
    """MinHash-LSH near-dup candidate pairs, verified by signature agreement.

    pages -> signatures (actor pool) -> per-band bucket keys -> inverted-index
    self-join on bucket -> distinct pairs -> estimated J = matching perms /
    num_perm >= threshold. One hash shuffle on the band bucket; the bucket key
    is '<band_idx>:<hash of band slice>' so all bands share a single join.
    """
    tau = threshold if threshold is not None else cfg.jaccard_threshold
    num_perm, bands = cfg.minhash_num_perm, cfg.minhash_bands
    rows_per_band = num_perm // bands

    sigs = read_pages(sf_dir, include_html=False).map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_size": cfg.shingle_size},
        **actor_kwargs(batch_size=1024),
    )

    def band_keys(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        sig_np = np.asarray(batch["sig"].to_pylist(), dtype=np.uint64)
        sig_strs = ["," .join(map(str, s)) for s in sig_np]
        u, keys, carried = [], [], []
        for i, url in enumerate(urls):
            for b in range(bands):
                chunk = sig_np[i, b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                u.append(url)
                keys.append(f"{b}:{h}")
                carried.append(sig_strs[i])
        return pa.table(
            {
                "url": pa.array(u, type=pa.string()),
                "bucket": pa.array(keys, type=pa.string()),
                "sig_s": pa.array(carried, type=pa.string()),
            }
        )

    bucketed = self_join_input(
        sigs.map_batches(band_keys, batch_format="pyarrow", zero_copy_batch=True)
    )
    joined = bucketed.join(
        bucketed,
        join_type="inner",
        on=("bucket",),
        left_suffix="_l",
        right_suffix="_r",
        **join_kwargs(cfg),
    )

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["url_l"], batch["url_r"])
        b = batch.filter(keep)
        key = pc.binary_join_element_wise(b["url_l"], b["url_r"], b["sig_s_l"], b["sig_s_r"], _SEP)
        return pa.table({"pair": key})

    pairs = joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
    distinct = pairs.groupby("pair").count()

    def finalize(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for packed in batch["pair"].to_pylist() if len(batch) else []:
            url_a, url_b, sl, sr = packed.split(_SEP)
            s1 = np.array(sl.split(","), dtype=np.uint64)
            s2 = np.array(sr.split(","), dtype=np.uint64)
            est = float((s1 == s2).mean())
            if est >= tau:
                out_a.append(url_a)
                out_b.append(url_b)
                out_j.append(int(round(est * 1e6)))
        return pa.table(
            {
                "url_a": pa.array(out_a, type=pa.string()),
                "url_b": pa.array(out_b, type=pa.string()),
                "est_jaccard_ppm": pa.array(out_j, type=pa.int64()),
            }
        )

    return distinct.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashStage:
    """Actor-pool stage: pages -> (url, simhash:uint64). 64-bit SimHash over
    whitespace tokens; blake2b hashes computed per UNIQUE token (cached per
    actor), per-document bit votes via one argsort + add.reduceat — no
    Python loop over documents."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = len(batch)
        tokens = pc.split_pattern(batch["text"], " ")
        flat = pc.list_flatten(tokens)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(tokens)
        sims = np.zeros(n_docs, dtype=np.uint64)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            uniq = enc.dictionary.to_pylist()
            cache = self._cache
            uniq_h = np.fromiter(
                (
                    cache.setdefault(
                        t,
                        int.from_bytes(
                            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                        ),
                    )
                    for t in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            hashes = uniq_h[enc.indices.to_numpy().astype(np.int64)]
            doc_idx = parents.to_numpy().astype(np.int64)
            order = np.argsort(doc_idx, kind="stable")
            hashes, doc_idx = hashes[order], doc_idx[order]
            bits = (
                (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
            ).astype(np.int32)
            present, starts = np.unique(doc_idx, return_index=True)
            token_counts = np.diff(np.append(starts, len(doc_idx)))
            votes = np.add.reduceat(bits, starts, axis=0) * 2 - token_counts[:, None]
            sel = (votes > 0).astype(np.uint64)
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            sims[present] = (sel * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {"url": batch["url"], "simhash": pa.array(sims, type=pa.uint64())}
        )


def simhash_pairs(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG, *, max_hamming: int = 3
) -> ray.data.Dataset:
    """SimHash near-dup pairs with Hamming distance <= max_hamming.

    Pigeonhole blocking: split 64 bits into max_hamming+1 bands; any pair
    within distance k agrees exactly on >= 1 band. groupby(band value) then
    verify true Hamming distance. Same inverted-index-join shape as LSH.
    """
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands

    sigs = read_pages(sf_dir, include_html=False).map_batches(
        SimHashStage, **actor_kwargs(batch_size=1024)
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        sims = batch["simhash"].to_numpy()
        u, keys, carried = [], [], []
        for i, url in enumerate(urls):
            v = int(sims[i])
            for b in range(n_bands):
                band_val = (v >> (b * band_bits)) & ((1 << band_bits) - 1)
                u.append(url)
                keys.append(f"{b}:{band_val}")
                carried.append(v)
        return pa.table(
            {
                "url": pa.array(u, type=pa.string()),
                "bucket": pa.array(keys, type=pa.string()),
                "simhash": pa.array(carried, type=pa.uint64()),
            }
        )

    bucketed = self_join_input(
        sigs.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
    )
    joined = bucketed.join(
        bucketed,
        join_type="inner",
        on=("bucket",),
        left_suffix="_l",
        right_suffix="_r",
        **join_kwargs(cfg),
    )

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["url_l"], batch["url_r"])
        b = batch.filter(keep)
        if len(b) == 0:
            return pa.table({"pair": pa.array([], type=pa.string())})
        xor = (
            b["simhash_l"].to_numpy().astype(np.uint64)
            ^ b["simhash_r"].to_numpy().astype(np.uint64)
        )
        # popcount via byte view (numpy<2 has no bitwise_count)
        ham = np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        ok = pa.array(ham <= max_hamming)
        b = b.filter(ok)
        key = pc.binary_join_element_wise(
            b["url_l"],
            b["url_r"],
            pa.array([str(h) for h in ham[np.asarray(ok)]], type=pa.string()),
            _SEP,
        )
        return pa.table({"pair": key})

    pairs = joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
    distinct = pairs.groupby("pair").count()

    def finalize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "url_a": pa.array([], type=pa.string()),
                    "url_b": pa.array([], type=pa.string()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        parts = pc.split_pattern(batch["pair"], _SEP)
        return pa.table(
            {
                "url_a": pc.list_element(parts, 0),
                "url_b": pc.list_element(parts, 1),
                "hamming": pc.cast(pc.list_element(parts, 2), pa.int64()),
            }
        )

    return distinct.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)

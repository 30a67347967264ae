"""Relational coverage, text analysis, similarity search vs DuckDB oracles."""

import pytest

from tests.conftest import SF_SMALL, assert_matches_oracle, to_arrow
from virtuoso_quad_log_ray.pipelines import relational as rel
from virtuoso_quad_log_ray.stages import similarity as sim
from virtuoso_quad_log_ray.stages import textstats as tx


@pytest.mark.usefixtures("ray_session")
class TestRelational:
    def test_pricing_summary(self, oracle):
        assert_matches_oracle(
            rel.pricing_summary(SF_SMALL), oracle, rel.PRICING_SUMMARY_SQL,
            ["l_returnflag", "l_linestatus"],
        )

    def test_revenue_by_nation(self, oracle):
        assert_matches_oracle(
            rel.revenue_by_nation(SF_SMALL), oracle, rel.REVENUE_BY_NATION_SQL, ["n_name"]
        )

    def test_top_orders(self, oracle):
        assert_matches_oracle(
            rel.top_orders(SF_SMALL), oracle, rel.top_orders_sql(), ["o_orderkey"]
        )

    def test_events_hourly(self, oracle):
        assert_matches_oracle(
            rel.events_hourly(SF_SMALL), oracle, rel.EVENTS_HOURLY_SQL, ["hour", "event_type"]
        )

    def test_latest_event(self, oracle):
        assert_matches_oracle(
            rel.latest_event_per_user(SF_SMALL), oracle, rel.LATEST_EVENT_SQL, ["user_id"]
        )

    def test_user_sessions(self, oracle):
        assert_matches_oracle(
            rel.user_sessions(SF_SMALL), oracle, rel.USER_SESSIONS_SQL, ["user_id"]
        )

    def test_asof_prev_event(self, oracle):
        assert_matches_oracle(
            rel.asof_prev_event(SF_SMALL), oracle, rel.ASOF_PREV_EVENT_SQL, ["event_id"]
        )

    def test_asof_inclusive_and_tie_semantics(self):
        """As-of is inclusive (right at the same ts counts) and ties on ts
        resolve to the max event_id; lefts with no prior right drop."""
        import numpy as np
        import pyarrow as pa

        from virtuoso_quad_log_ray.pipelines import relational as rel_mod

        # build a bucket table directly against the inner kernel via the
        # public operator on a synthetic parquet dir
        import pyarrow.parquet as pq

        def run(tmpdir, rows):
            pq.write_table(
                pa.table(
                    {
                        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                        "event_type": pa.array([r[3] for r in rows]),
                        "value": pa.array([0.0] * len(rows)),
                        "props": pa.array([""] * len(rows)),
                    }
                ),
                f"{tmpdir}/events.parquet",
            )
            return to_arrow(rel_mod.asof_prev_event(tmpdir)).sort_by("event_id")

        import datetime as dt
        import tempfile

        t0 = dt.datetime(2024, 1, 1)
        s = dt.timedelta(seconds=1)
        rows = [
            (1, t0, 7, "click"),
            (2, t0, 7, "click"),          # tie on ts with id 1 -> max id wins
            (3, t0, 7, "purchase"),       # inclusive: same-ts click counts
            (4, t0 + s, 7, "purchase"),   # later purchase sees id 2 as well
            (5, t0, 8, "purchase"),       # user 8 has NO click -> dropped
            (6, t0 + s, 8, "click"),      # click after the purchase: no leak
        ]
        with tempfile.TemporaryDirectory() as tmpdir:
            out = run(tmpdir, rows)
        assert out["event_id"].to_pylist() == [3, 4]
        assert out["prev_event_id"].to_pylist() == [2, 2]

    def test_range_window_counts(self, oracle):
        assert_matches_oracle(
            rel.range_window_counts(SF_SMALL), oracle, rel.RANGE_WINDOW_COUNTS_SQL,
            ["event_id"],
        )

    def test_hll_distinct_users(self, oracle):
        """HLL sketch: per-type approx distinct users within 5% of exact,
        deterministic across runs (mergeability is unit-tested in the
        kernel via split-vs-whole register equality)."""
        from virtuoso_quad_log_ray.stages.sketches import events_distinct_users

        got = {
            r["event_type"]: r["approx_distinct"]
            for r in to_arrow(events_distinct_users(SF_SMALL)).to_pylist()
        }
        exact = dict(
            oracle.sql(
                "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
            ).fetchall()
        )
        assert set(got) == set(exact)
        for k, n in exact.items():
            assert abs(got[k] - n) / n <= 0.05, (k, got[k], n)
        again = {
            r["event_type"]: r["approx_distinct"]
            for r in to_arrow(events_distinct_users(SF_SMALL)).to_pylist()
        }
        assert again == got  # deterministic

    def test_hll_distinct_users_oracle(self, oracle):
        """Value-exact vs the SQL re-derivation of the sketch itself
        (splitmix64, registers, estimator) — the estimate must agree
        including its approximation error."""
        from virtuoso_quad_log_ray.stages.sketches import (
            events_distinct_users,
            events_distinct_users_sql,
        )

        assert_matches_oracle(
            events_distinct_users(SF_SMALL),
            oracle,
            events_distinct_users_sql(),
            ["event_type"],
        )

    def test_hll_distributed_merge_large_cardinality(self):
        """The DISTRIBUTED path (per-block partials + max-merge shuffle) at
        200k distinct values across many blocks stays within the sketch's
        error bound and equals a single-block run exactly (merge = max)."""
        import numpy as np
        import pyarrow as pa
        import ray
        import ray.data

        from virtuoso_quad_log_ray.stages.sketches import hll_distinct

        n = 200_000
        vals = np.arange(n, dtype=np.int64)
        keys = np.where(vals % 3 == 0, "a", "b")
        tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
        many = ray.data.from_arrow(tbl).repartition(16)
        one = ray.data.from_arrow(tbl).repartition(1)
        got_many = {
            r["key"]: r["approx_distinct"]
            for r in to_arrow(hll_distinct(many, "k", "v")).to_pylist()
        }
        got_one = {
            r["key"]: r["approx_distinct"]
            for r in to_arrow(hll_distinct(one, "k", "v")).to_pylist()
        }
        assert got_many == got_one  # merge-of-partials == single pass
        exact = {"a": (n + 2) // 3, "b": n - (n + 2) // 3}
        for k, e in exact.items():
            assert abs(got_many[k] - e) / e < 0.05, (k, got_many[k], e)

    def test_hll_high_key_cardinality_vectorized_partial(self):
        """VERDICT r3 #6: the partial scatters ALL keys in one
        np.maximum.at (no per-unique-key Python). At 12k distinct keys the
        kernel stays exact vs the scalar reference path: every key with a
        unique value estimates ~1, and the keyed grid equals per-key
        _registers() row for row on a sampled subset."""
        import numpy as np

        from virtuoso_quad_log_ray.stages.sketches import (
            _keyed_registers,
            _registers,
            _splitmix64,
        )

        n_keys = 12_000
        per_key = 3
        vals = np.arange(n_keys * per_key, dtype=np.int64)
        h = _splitmix64(vals.view(np.uint64))
        kidx = np.repeat(np.arange(n_keys, dtype=np.int64), per_key)
        grid = _keyed_registers(h, kidx, n_keys)
        assert grid.shape == (n_keys, 4096) and grid.dtype == np.uint8
        # keyed grid == the per-key scalar kernel, sampled across the range
        for ki in (0, 1, 599, 5_000, 11_999):
            expect = _registers(h[kidx == ki])
            assert np.array_equal(grid[ki], expect), ki

    def test_filtered_events(self, oracle):
        assert_matches_oracle(
            rel.filtered_event_stats(SF_SMALL), oracle, rel.FILTERED_EVENT_STATS_SQL,
            ["event_type"],
        )


@pytest.mark.usefixtures("ray_session")
class TestTextStats:
    def test_text_quality(self, oracle):
        assert_matches_oracle(tx.text_quality(SF_SMALL), oracle, tx.TEXT_QUALITY_SQL, ["url"])

    def test_fingerprints(self, oracle):
        assert_matches_oracle(tx.fingerprints(SF_SMALL), oracle, tx.FINGERPRINTS_SQL, ["url"])

    def test_shard_plan_vs_oracle(self, oracle):
        assert_matches_oracle(
            tx.shard_plan(SF_SMALL), oracle, tx.shard_plan_sql(), ["url"]
        )

    def test_corpus_filter_vs_oracle(self, oracle):
        assert_matches_oracle(
            tx.corpus_filter(SF_SMALL), oracle, tx.CORPUS_FILTER_SQL, ["url"]
        )

    def test_stats_by_lang_vs_oracle(self, oracle):
        assert_matches_oracle(
            tx.corpus_stats_by_lang(SF_SMALL), oracle, tx.CORPUS_STATS_BY_LANG_SQL, ["lang"]
        )

    def test_redact_pii_vs_oracle(self, oracle):
        assert_matches_oracle(tx.redact_pii(SF_SMALL), oracle, tx.REDACT_PII_SQL, ["url"])

    def test_text_chunks_vs_oracle(self, oracle):
        assert_matches_oracle(
            tx.text_chunks(SF_SMALL), oracle, tx.TEXT_CHUNKS_SQL, ["url", "chunk_idx"]
        )

    def test_text_chunks_reassemble(self):
        """Chunk texts joined back with ' ' reproduce each page's text
        exactly (split+join losslessness), and token accounting is exact."""
        import pyarrow as pa

        from virtuoso_quad_log_ray.sources.pages import read_pages

        pages = to_arrow(read_pages(SF_SMALL, include_html=False))
        chunks = to_arrow(tx.text_chunks(SF_SMALL)).sort_by(
            [("url", "ascending"), ("chunk_idx", "ascending")]
        )
        by_url: dict = {}
        for u, ct, nt in zip(
            chunks["url"].to_pylist(),
            chunks["chunk_text"].to_pylist(),
            chunks["n_toks"].to_pylist(),
        ):
            by_url.setdefault(u, []).append((ct, nt))
        for u, text in zip(pages["url"].to_pylist(), pages["text"].to_pylist()):
            parts = by_url[u]
            assert " ".join(p[0] for p in parts) == text
            assert sum(p[1] for p in parts) == len(text.split(" "))

    def test_redact_batch_kernel(self):
        """The PII kernel rewrites emails/phones/IPs to typed tokens and
        counts matches per pattern on the original text."""
        import pyarrow as pa

        clean, n = tx.redact_batch(
            pa.array(
                [
                    "mail john.doe+x@example.co.uk or call 555-123-4567",
                    "host 10.0.0.255, alt 1.2.3.4",
                    "clean text",
                    "",
                ]
            )
        )
        assert clean.to_pylist() == [
            "mail <EMAIL> or call <PHONE>",
            "host <IP>, alt <IP>",
            "clean text",
            "",
        ]
        assert n.to_pylist() == [2, 2, 0, 0]

    def test_redact_batch_null_rows(self):
        """ADVICE r3: a null text row must yield ('', 0) — not NaN-cast
        garbage — matching the oracle SQL's coalesce(text, '')."""
        import pyarrow as pa

        clean, n = tx.redact_batch(
            pa.array(["a@b.co ok", None, "", None], type=pa.string())
        )
        assert clean.to_pylist() == ["<EMAIL> ok", "", "", ""]
        assert n.to_pylist() == [1, 0, 0, 0]

    def test_text_chunks_null_text_oracle_parity(self, tmp_path, oracle):
        """ADVICE r3: engine and DuckDB oracle agree on a corpus containing
        a NULL text row (both treat it as '': one chunk, one empty token)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        sf = tmp_path / "sf"
        sf.mkdir()
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(["alpha beta", None, ""], type=pa.string()),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["t"] * 3),
            }
        )
        pq.write_table(docs, str(sf / "documents.parquet"))
        got = (
            to_arrow(tx.text_chunks(str(sf), chunk_tokens=1))
            .sort_by([("url", "ascending"), ("chunk_idx", "ascending")])
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = (
            con.execute(tx.text_chunks_sql(1))
            .arrow()
            .sort_by([("url", "ascending"), ("chunk_idx", "ascending")])
        )
        assert got.num_rows == want.num_rows
        for col in ("url", "chunk_idx", "n_toks", "chunk_text"):
            assert got[col].to_pylist() == want[col].to_pylist(), col

    def test_redact_batch_duckdb_parity_property(self):
        """Property: the Arrow RE2 rewrite is byte-identical to DuckDB's for
        arbitrary text mixed with synthesized emails/phones/IPs — the exact
        parity the driver's value-hash depends on."""
        import duckdb
        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        pieces = st.one_of(
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
                max_size=20,
            ),
            st.just("a.b-c_d@ex-ample.co.uk"),
            st.just("555-123-4567"),
            st.just("10.0.0.1"),
            st.just("1.2.3.4.5.6"),
            st.just("v1.2.3"),
            st.just("x@y"),
        )
        texts = st.lists(
            st.lists(pieces, max_size=6).map(" ".join), min_size=1, max_size=5
        )
        con = duckdb.connect()

        @settings(max_examples=30, deadline=None)
        @given(ts=texts)
        def check(ts):
            clean, n = tx.redact_batch(pa.array(ts, type=pa.string()))
            expr, cnts = "t", []
            for pat, tok in tx.PII_PATTERNS:
                esc = pat.replace("'", "''")
                cnts.append(f"len(regexp_extract_all(t, '{esc}'))")
                expr = f"regexp_replace({expr}, '{esc}', '{tok}', 'g')"
            got = con.execute(
                f"SELECT {expr}, {' + '.join(cnts)} FROM (SELECT unnest(?) AS t)", [ts]
            ).fetchall()
            assert [r[0] for r in got] == clean.to_pylist()
            assert [r[1] for r in got] == n.to_pylist()

        check()

    def test_winnow_fingerprints(self):
        """Deterministic; byte-identical mirror clones get identical
        fingerprint sets; near-dups (' extra' suffix) share most content so
        their counts stay close."""
        a = to_arrow(tx.winnow_fingerprints(SF_SMALL))
        b = to_arrow(tx.winnow_fingerprints(SF_SMALL))
        da = dict(zip(a["url"].to_pylist(),
                      zip(a["n_fingerprints"].to_pylist(), a["fp_xor"].to_pylist())))
        db = dict(zip(b["url"].to_pylist(),
                      zip(b["n_fingerprints"].to_pylist(), b["fp_xor"].to_pylist())))
        assert da == db
        mirrors = [u for u in da if u.endswith("?mirror=1")]
        assert len(mirrors) == 20
        assert all(da[u] == da[u[: -len("?mirror=1")]] for u in mirrors)

    def test_winnow_fingerprints_oracle(self, oracle):
        """Value-exact vs the HUGEINT SQL re-derivation of the same
        base-257 rolling hash + window-min selection (winnow_sql)."""
        assert_matches_oracle(
            tx.winnow_fingerprints(SF_SMALL), oracle, tx.winnow_sql(), ["url"]
        )

    def test_winnow_oracle_boundary_lengths(self, tmp_path):
        """Engine vs SQL on a crafted corpus hitting every selection-branch
        boundary: no k-gram (len < K), exactly one k-gram (m=1), one short
        of a full window (m=W-1), exactly one window (m=W — BOTH the window
        and short-doc branches fire; distinct must collapse them), one past
        (m=W+1), and the empty string."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from virtuoso_quad_log_ray.stages.textstats import WINNOW_K, WINNOW_W

        K, W = WINNOW_K, WINNOW_W
        # text of length L has m = L - K + 1 k-grams
        lengths = [0, K - 3, K, K + W - 2, K + W - 1, K + W, 3 * W]
        texts = ["abcdefghij kl mnop"[:L].ljust(L, "x") for L in lengths]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(2, 2 + len(texts))), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["news"] * len(texts)),
                "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = to_arrow(tx.winnow_fingerprints(str(tmp_path)))
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
        )
        ora = con.sql(tx.winnow_sql()).arrow()
        ga = sorted(map(tuple, got.to_pandas().astype(str).values.tolist()))
        oa = sorted(map(tuple, ora.to_pandas().astype(str).values.tolist()))
        assert len(ga) == len(texts) and ga == oa

    def test_lang_id_runs_and_is_deterministic(self):
        a = to_arrow(tx.lang_id(SF_SMALL))
        b = to_arrow(tx.lang_id(SF_SMALL))
        assert len(a) == 537
        da = dict(zip(a["url"].to_pylist(), a["lang_pred"].to_pylist()))
        db = dict(zip(b["url"].to_pylist(), b["lang_pred"].to_pylist()))
        assert da == db


@pytest.mark.usefixtures("ray_session")
class TestSimilarity:
    def test_ann_topk(self, oracle):
        assert_matches_oracle(
            sim.ann_topk(SF_SMALL), oracle, sim.ann_topk_sql(), ["query_id", "rank"]
        )

    def test_emb_clusters_deterministic_and_covering(self):
        a = to_arrow(sim.embedding_clusters(SF_SMALL))
        b = to_arrow(sim.embedding_clusters(SF_SMALL))
        da = dict(zip(a["vec_id"].to_pylist(), a["cluster"].to_pylist()))
        db = dict(zip(b["vec_id"].to_pylist(), b["cluster"].to_pylist()))
        assert da == db
        assert all(0 <= c < 16 for c in da.values())
        assert len(set(da.values())) >= 4  # vectors spread over clusters

    def test_emb_clusters_match_dense_reference(self):
        """VERDICT r4 #3: cluster assignments pinned against an INDEPENDENT
        dense numpy replication of the algorithm (init = first n_clusters
        vectors in file order, 2 Lloyd rounds, final assignment) — the same
        upgrade shape as the PageRank pin. Exact equality, not just
        determinism."""
        import numpy as np
        import pyarrow.parquet as pq

        got = to_arrow(sim.embedding_clusters(SF_SMALL))
        gd = dict(zip(got["vec_id"].to_pylist(), got["cluster"].to_pylist()))
        t = pq.read_table(
            f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = t["vec_id"].to_numpy().astype(np.int64)
        m = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
        c = m[:16].copy()
        for _ in range(2):
            a = np.argmin(((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1)
            for j in range(16):
                if (a == j).any():
                    c[j] = m[a == j].mean(axis=0)
        ref = np.argmin(((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1)
        assert gd == dict(zip(ids.tolist(), ref.tolist()))

    def test_ann_topk_ivf_recall(self):
        """VERDICT r4 #3: recall@k >= 0.9 vs the exact brute-force ann_topk
        at the sandbox config (deterministic: seedless init, fixed data;
        measured 0.92 at n_lists=8 / n_probe=4)."""
        exact = to_arrow(sim.ann_topk(SF_SMALL))
        approx = to_arrow(sim.ann_topk_ivf(SF_SMALL, n_lists=8, n_probe=4))
        ex = set(zip(exact["query_id"].to_pylist(), exact["neighbor_id"].to_pylist()))
        ap = set(zip(approx["query_id"].to_pylist(), approx["neighbor_id"].to_pylist()))
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.9, f"IVF recall {recall:.2f}"
        # determinism
        again = to_arrow(sim.ann_topk_ivf(SF_SMALL, n_lists=8, n_probe=4))
        assert sorted(zip(*[approx[c].to_pylist() for c in approx.column_names])) == \
               sorted(zip(*[again[c].to_pylist() for c in again.column_names]))

    def test_emb_neardup_recall_vs_exact_pairs(self):
        """VERDICT r4 #3: the LSH-bucketed near-dup path vs the EXACT
        all-pairs cosine set computed in-test (500 vectors — trivially dense
        here; the engine never does this). Precision is 1.0 by construction
        (exact cosine verify on every candidate); recall >= 0.9 at the
        default banding (measured 1.0 at sf0.001)."""
        import numpy as np
        import pyarrow.parquet as pq

        got = to_arrow(sim.embedding_neardup_pairs(SF_SMALL))
        g = set(zip(got["vec_a"].to_pylist(), got["vec_b"].to_pylist()))
        t = pq.read_table(
            f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = t["vec_id"].to_numpy().astype(np.int64)
        m = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        iu = np.triu_indices(len(ids), k=1)
        sel = (mn @ mn.T)[iu] >= 0.45
        lo = np.minimum(ids[iu[0][sel]], ids[iu[1][sel]])
        hi = np.maximum(ids[iu[0][sel]], ids[iu[1][sel]])
        exact_pairs = set(zip(lo.tolist(), hi.tolist()))
        assert len(exact_pairs) > 0
        assert g <= exact_pairs  # exact verify => no false positives
        recall = len(exact_pairs & g) / len(exact_pairs)
        assert recall >= 0.9, f"embedding LSH recall {recall:.2f}"
        if len(got):
            assert min(got["cos_ppm"].to_pylist()) >= 450_000


@pytest.mark.usefixtures("ray_session")
class TestGroupedTopkQuantilesSliding:
    def test_top_orders_by_priority(self, oracle):
        assert_matches_oracle(
            rel.top_orders_by_priority(SF_SMALL),
            oracle,
            rel.TOP_ORDERS_BY_PRIORITY_SQL,
            ["o_orderpriority", "rank"],
        )

    def test_top_orders_by_priority_k_rows_per_group(self):
        t = to_arrow(rel.top_orders_by_priority(SF_SMALL))
        import collections

        by_pri = collections.Counter(t["o_orderpriority"].to_pylist())
        assert all(v == rel.TOPK_PER_GROUP for v in by_pri.values())
        assert sorted(set(t["rank"].to_pylist())) == [1, 2, 3]

    def test_value_quantiles(self, oracle):
        assert_matches_oracle(
            rel.value_quantiles(SF_SMALL), oracle, rel.VALUE_QUANTILES_SQL, ["event_type"]
        )

    def test_value_quantiles_exact_ceil_edge(self, tmp_path, oracle):
        """q*n integral is the float-hostile case: 0.99 * 100 =
        99.000000000000014 in doubles, whose ceil picks element 100 instead
        of 99. The engine's rational arithmetic and DuckDB must both pick
        the 99th element."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "sf"
        d.mkdir()
        vals = (np.arange(1, 101) / 100.0)  # value_c = 1..100, one type
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(np.arange(100)),
                    "ts": pa.array([0] * 100, type=pa.timestamp("us")),
                    "user_id": pa.array([1] * 100),
                    "event_type": pa.array(["t"] * 100),
                    "value": pa.array(vals),
                }
            ),
            str(d / "events.parquet"),
        )
        t = to_arrow(rel.value_quantiles(str(d)))
        assert t["p99_c"].to_pylist() == [99]
        assert t["p50_c"].to_pylist() == [50]
        got = oracle.execute(
            "SELECT quantile_disc(CAST(round(100*value) AS BIGINT), 0.99) "
            f"FROM '{d}/events.parquet'"
        ).fetchone()[0]
        assert got == 99

    def test_events_sliding(self, oracle):
        assert_matches_oracle(
            rel.events_sliding(SF_SMALL), oracle, rel.EVENTS_SLIDING_SQL, ["ws", "event_type"]
        )

    def test_events_sliding_covers_hourly(self):
        """Every event lands in exactly window/slide windows, so the total
        event count across sliding windows is that multiple of the raw
        count; the on-the-hour windows agree with events_hourly."""
        import pyarrow.compute as pc

        sl = to_arrow(rel.events_sliding(SF_SMALL))
        hr = to_arrow(rel.events_hourly(SF_SMALL))
        factor = rel.HOP_WINDOW_S // rel.HOP_SLIDE_S
        assert pc.sum(sl["n_events"]).as_py() == factor * pc.sum(hr["n_events"]).as_py()


@pytest.mark.usefixtures("ray_session")
class TestSamplingContamination:
    def test_sample_stratified(self, oracle):
        assert_matches_oracle(
            tx.sample_stratified(SF_SMALL), oracle, tx.sample_stratified_sql(), ["url"]
        )

    def test_sample_rates_respected(self):
        """Kept fraction per language tracks the configured permille (the
        md5 selector is uniform), and the sample is deterministic."""
        a = to_arrow(tx.sample_stratified(SF_SMALL))
        b = to_arrow(tx.sample_stratified(SF_SMALL))
        assert sorted(a["url"].to_pylist()) == sorted(b["url"].to_pylist())
        keep_all = to_arrow(
            tx.sample_stratified(SF_SMALL, rates={"en": 1000})
        )
        import duckdb

        total = duckdb.sql(
            f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet'"
        ).fetchone()[0]
        assert len(keep_all) >= total  # every page kept (plus clones)

    def test_contamination(self, oracle):
        assert_matches_oracle(
            tx.contamination(SF_SMALL), oracle, tx.contamination_sql(), ["url"]
        )

    def test_contamination_bounds_and_exclusion(self):
        t = to_arrow(tx.contamination(SF_SMALL))
        ppm = t["contam_ppm"].to_pylist()
        assert all(0 <= p <= 1_000_000 for p in ppm)
        n_sh = t["n_shingles"].to_pylist()
        n_c = t["n_contaminated"].to_pylist()
        assert all(0 <= c <= s for c, s in zip(n_c, n_sh))
        # no eval-shard url appears in the train-side report
        import hashlib

        for u in t["url"].to_pylist():
            sel = int.from_bytes(hashlib.md5(u.encode()).digest()[:4], "big")
            assert sel % tx.EVAL_SHARDS != 0


@pytest.mark.usefixtures("ray_session")
class TestPackPlan:
    def test_pack_plan(self, oracle):
        assert_matches_oracle(
            tx.pack_plan(SF_SMALL), oracle, tx.pack_plan_sql(), ["url"]
        )

    def test_pack_plan_invariants(self):
        """Every page planned exactly once; within a shard, bin ids are
        nondecreasing in url order and consecutive (no empty bins); start
        offsets reconstruct from n_tokens."""
        import collections

        t = to_arrow(tx.pack_plan(SF_SMALL))
        urls = t["url"].to_pylist()
        assert len(urls) == len(set(urls))
        by_shard = collections.defaultdict(list)
        for u, s, n, b in zip(
            urls, t["shard"].to_pylist(), t["n_tokens"].to_pylist(), t["bin_id"].to_pylist()
        ):
            by_shard[s].append((u, n, b))
        for s, rows in by_shard.items():
            rows.sort()
            start = 0
            prev_bin = 0
            for u, n, b in rows:
                assert b == start // tx.PACK_BUDGET_TOKENS
                assert prev_bin <= b <= prev_bin + max(1, n // tx.PACK_BUDGET_TOKENS + 1)
                prev_bin = b
                start += n


@pytest.mark.usefixtures("ray_session")
class TestAntiJoin:
    def test_customers_no_urgent_orders(self, oracle):
        assert_matches_oracle(
            rel.customers_no_urgent_orders(SF_SMALL),
            oracle,
            rel.CUSTOMERS_NO_URGENT_SQL,
            ["c_custkey"],
        )

    def test_anti_join_disjoint_from_probe_side(self):
        import duckdb

        t = to_arrow(rel.customers_no_urgent_orders(SF_SMALL))
        with_urgent = {
            r[0]
            for r in duckdb.sql(
                f"SELECT DISTINCT o_custkey FROM '{SF_SMALL}/orders.parquet' "
                "WHERE o_orderpriority = '1-URGENT'"
            ).fetchall()
        }
        assert not (set(t["c_custkey"].to_pylist()) & with_urgent)
        assert len(t) > 0  # some customers never place an urgent order


@pytest.mark.usefixtures("ray_session")
class TestRepetition:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            tx.text_repetition(SF_SMALL), oracle, tx.TEXT_REPETITION_SQL, ["url"]
        )

    def test_signal_invariants(self):
        t = to_arrow(tx.text_repetition(SF_SMALL)).to_pandas()
        # the most frequent word occurs at least once and at most n_words times
        assert (t.top_word_n >= 1).all() and (t.top_word_n <= t.n_words).all()
        # duplicate 2-grams are bounded by total 2-grams (n_words - 1)
        assert (t.dup_2gram_n >= 0).all()
        assert (t.dup_2gram_n <= (t.n_words - 1).clip(lower=0)).all()
        # word-soup corpus genuinely repeats: some page has a duplicate 2-gram
        assert t.dup_2gram_n.sum() > 0 and t.top_word_n.max() > 1


@pytest.mark.usefixtures("ray_session")
class TestTfidf:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            tx.tfidf_top_terms(SF_SMALL), oracle, tx.tfidf_top_terms_sql(), ["url", "rank"]
        )

    def test_shape_and_ranking(self):
        t = to_arrow(tx.tfidf_top_terms(SF_SMALL)).to_pandas()
        # exactly k rows per url, ranks 1..k, ordered by (tf desc, df asc)
        per_url = t.groupby("url")["rank"].agg(["count", "min", "max"])
        assert (per_url["count"] == tx.TFIDF_TOP_K).all()
        assert (per_url["min"] == 1).all() and (per_url["max"] == tx.TFIDF_TOP_K).all()
        s = t.sort_values(["url", "rank"])
        g = s.groupby("url")
        assert (g["tf"].diff().dropna() <= 0).all()  # tf non-increasing down ranks


@pytest.mark.usefixtures("ray_session")
class TestCorpusCurate:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            tx.corpus_curate(SF_SMALL), oracle, tx.corpus_curate_sql(), ["url"]
        )

    def test_composition_consistent_with_stages(self):
        """curate == gate -> keep-first dedup -> shard, stage by stage."""
        curated = to_arrow(tx.corpus_curate(SF_SMALL))
        gated = to_arrow(tx.corpus_filter(SF_SMALL))
        # ONE execution for both columns: block order differs between
        # executions, so per-column re-execution would misalign the zip
        sp = to_arrow(tx.shard_plan(SF_SMALL))
        shard_of = dict(zip(sp["url"].to_pylist(), sp["shard"].to_pylist()))
        # every curated url passed the gate, and shards match the shard plan
        gate_urls = set(gated["url"].to_pylist())
        for u, s in zip(curated["url"].to_pylist(), curated["shard"].to_pylist()):
            assert u in gate_urls
            assert s == shard_of[u]
        # keep-first: curated urls are unique and <= gate survivors
        assert len(set(curated["url"].to_pylist())) == len(curated)
        assert len(curated) <= len(gated)


@pytest.mark.usefixtures("ray_session")
class TestHeavyHitters:
    def test_matches_oracle(self, oracle):
        from virtuoso_quad_log_ray.stages import sketches as sk

        assert_matches_oracle(
            sk.heavy_hitters(SF_SMALL), oracle, sk.heavy_hitters_sql(), ["term"]
        )

    def test_exact_under_forced_mg_compression(self):
        """Per-block vocab far above k forces the MG decrement on every
        block; the two-pass recount must still be EXACT."""
        import pyarrow as pa
        import ray.data

        from virtuoso_quad_log_ray.stages import sketches as sk

        phi = 0.05  # k = 40 counters; each block below carries ~1000+ terms
        blocks, rare_id = [], 0
        for blk in range(8):
            texts = []
            # hot terms present in every block
            texts.append(" ".join(["hot1"] * 100))
            if blk < 5:
                texts.append(" ".join(["hot2"] * 100))
            # ~1087 distinct once-only rare terms per block
            for _ in range(4):
                row = " ".join(f"r{rare_id + i}" for i in range(272))
                rare_id += 272
                texts.append(row)
            if blk == 0:
                texts.append(None)  # null text row must not poison the scan
            blocks.append(pa.table({"text": pa.array(texts, type=pa.string())}))
        ds = ray.data.from_arrow(blocks)
        n = 8 * 100 + 5 * 100 + rare_id  # 10_004 tokens
        got = {
            r["term"]: r["n_occurrences"]
            for r in to_arrow(sk.heavy_hitters_over(ds, phi=phi)).to_pylist()
        }
        import math

        min_count = math.ceil(phi * n)  # 501
        assert got == {"hot1": 800}, (got, min_count, n)

    def test_threshold_boundary_inclusive(self):
        """A term sitting exactly on ceil(phi*n) is included (>= semantics)."""
        import pyarrow as pa
        import ray.data

        from virtuoso_quad_log_ray.stages import sketches as sk

        # 100 tokens total, phi=0.1 -> min_count=10; "edge" appears exactly 10x
        filler = " ".join(f"f{i}" for i in range(90))
        t = pa.table({"text": pa.array([" ".join(["edge"] * 10), filler])})
        got = {
            r["term"]: r["n_occurrences"]
            for r in to_arrow(
                sk.heavy_hitters_over(ray.data.from_arrow(t), phi=0.1)
            ).to_pylist()
        }
        assert got == {"edge": 10}


@pytest.mark.usefixtures("ray_session")
class TestShuffleShards:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            tx.shuffle_shards(SF_SMALL), oracle, tx.shuffle_shards_sql(), ["url"]
        )

    def test_positions_are_contiguous_per_shard(self):
        import collections

        t = to_arrow(tx.shuffle_shards(SF_SMALL))
        by_shard = collections.defaultdict(list)
        for s, p in zip(t["shard"].to_pylist(), t["pos"].to_pylist()):
            by_shard[s].append(p)
        assert set(by_shard) <= set(range(tx.SHUFFLE_SHARDS))
        for s, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), s

    def test_seed_changes_order_but_not_membership(self):
        a = to_arrow(tx.shuffle_shards(SF_SMALL, seed="A"))
        b = to_arrow(tx.shuffle_shards(SF_SMALL, seed="B"))
        assert sorted(a["url"].to_pylist()) == sorted(b["url"].to_pylist())
        pa_map = dict(zip(a["url"].to_pylist(), zip(a["shard"].to_pylist(), a["pos"].to_pylist())))
        pb_map = dict(zip(b["url"].to_pylist(), zip(b["shard"].to_pylist(), b["pos"].to_pylist())))
        assert pa_map != pb_map  # a different seed is a different shuffle
        # same seed is byte-stable across runs
        a2 = to_arrow(tx.shuffle_shards(SF_SMALL, seed="A"))
        pa2_map = dict(zip(a2["url"].to_pylist(), zip(a2["shard"].to_pylist(), a2["pos"].to_pylist())))
        assert pa_map == pa2_map


@pytest.mark.usefixtures("ray_session")
class TestCurateToJsonl:
    def test_curated_corpus_ships_and_reads_back(self, tmp_path):
        from virtuoso_quad_log_ray.sources.pages import read_jsonl_corpus

        root = str(tmp_path / "delivery")
        man = tx.curate_to_jsonl(SF_SMALL, root, epoch="E9")
        curated = to_arrow(tx.corpus_curate(SF_SMALL))
        assert man.quad_count == len(curated)
        back = to_arrow(read_jsonl_corpus(root))
        assert sorted(back["url"].to_pylist()) == sorted(curated["url"].to_pylist())
        # delivered text is the real page text (spot-check via pages join)
        from virtuoso_quad_log_ray.sources.pages import read_pages

        pages = to_arrow(read_pages(SF_SMALL, include_html=False))
        texts = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
        for u, t in zip(back["url"].to_pylist()[:25], back["text"].to_pylist()[:25]):
            assert texts[u] == t


@pytest.mark.usefixtures("ray_session")
class TestSampleGroupK:
    def test_matches_oracle(self, oracle):
        assert_matches_oracle(
            tx.sample_group_k(SF_SMALL), oracle, tx.sample_group_k_sql(), ["lang", "rn"]
        )

    def test_exact_k_per_group_and_stability(self):
        import collections

        t = to_arrow(tx.sample_group_k(SF_SMALL, k=7))
        by_lang = collections.Counter(t["lang"].to_pylist())
        # every language with >= 7 pages contributes exactly 7
        from virtuoso_quad_log_ray.sources.pages import read_pages

        pages = to_arrow(read_pages(SF_SMALL, include_html=False))
        totals = collections.Counter(pages["lang"].to_pylist())
        for lang, n in totals.items():
            assert by_lang[lang] == min(7, n), lang
        # deterministic across runs
        t2 = to_arrow(tx.sample_group_k(SF_SMALL, k=7))
        assert sorted(zip(t["lang"].to_pylist(), t["url"].to_pylist())) == sorted(
            zip(t2["lang"].to_pylist(), t2["url"].to_pylist())
        )


@pytest.mark.usefixtures("ray_session")
class TestProductionHashMode:
    """VERDICT r4 #4: cfg.oracle_mode=False swaps every per-row hashlib.md5
    sampling/sharding/fingerprint key for the vectorized 128-bit hash. The
    selections legitimately differ from oracle mode (different permutation);
    these tests pin the invariants that must NOT differ: determinism,
    uniformity, exact-k/permutation structure, and — for incremental
    admission — the hash-independent admitted set."""

    from virtuoso_quad_log_ray.config import EngineConfig as _EC

    PROD = _EC(oracle_mode=False)

    def test_shard_plan_uniform_and_deterministic(self):
        a = to_arrow(tx.shard_plan(SF_SMALL, self.PROD))
        b = to_arrow(tx.shard_plan(SF_SMALL, self.PROD))
        da = dict(zip(a["url"].to_pylist(), a["shard"].to_pylist()))
        db = dict(zip(b["url"].to_pylist(), b["shard"].to_pylist()))
        assert da == db and len(da) == len(a)
        assert all(0 <= s < 16 for s in da.values())
        assert len(set(da.values())) >= 12  # ~uniform over 16 shards

    def test_shuffle_shards_is_permutation(self):
        from virtuoso_quad_log_ray.sources.pages import read_pages

        t = to_arrow(tx.shuffle_shards(SF_SMALL, self.PROD)).sort_by(
            [("shard", "ascending"), ("pos", "ascending")]
        )
        assert len(t) == read_pages(SF_SMALL, include_html=False).count()
        assert len(set(t["url"].to_pylist())) == len(t)
        by_shard: dict = {}
        for s, p in zip(t["shard"].to_pylist(), t["pos"].to_pylist()):
            by_shard.setdefault(s, []).append(p)
        for s, ps in by_shard.items():
            assert ps == list(range(1, len(ps) + 1)), s

    def test_sample_group_k_exact_k_per_lang(self):
        prod = to_arrow(tx.sample_group_k(SF_SMALL, self.PROD))
        oracle_side = to_arrow(tx.sample_group_k(SF_SMALL))
        import collections

        cp = collections.Counter(prod["lang"].to_pylist())
        co = collections.Counter(oracle_side["lang"].to_pylist())
        assert cp == co  # same k per group, different (valid) members

    def test_sample_stratified_rate_respected(self):
        import collections

        from virtuoso_quad_log_ray.sources.pages import read_pages

        kept = to_arrow(tx.sample_stratified(SF_SMALL, self.PROD))
        pages = to_arrow(
            read_pages(SF_SMALL, include_html=False).select_columns(["url", "lang"])
        )
        tot = collections.Counter(pages["lang"].to_pylist())
        got = collections.Counter(kept["lang"].to_pylist())
        for lang, permille in tx.SAMPLE_RATES_PERMILLE.items():
            if tot[lang] < 50:
                continue
            frac = got[lang] / tot[lang]
            assert abs(frac - permille / 1000) < 0.15, (lang, frac)

    def test_fingerprints_equality_classes_match_md5(self):
        prod = to_arrow(tx.fingerprints(SF_SMALL, self.PROD))
        md5 = to_arrow(tx.fingerprints(SF_SMALL))

        def classes(t):
            groups: dict = {}
            for u, f in zip(t["url"].to_pylist(), t["fingerprint"].to_pylist()):
                groups.setdefault(f, set()).add(u)
            return sorted(map(frozenset, groups.values()), key=min)

        assert classes(prod) == classes(md5)
        assert all(len(f) == 32 for f in prod["fingerprint"].to_pylist())

    def test_incremental_admission_is_hash_independent(self):
        from virtuoso_quad_log_ray.stages import dedup as dd

        oracle_side = to_arrow(dd.dedup_incremental(SF_SMALL))
        prod = to_arrow(dd.dedup_incremental(SF_SMALL, self.PROD))
        # the admitted URL set is an anti-join on content identity — the
        # same under any collision-free fingerprint
        assert set(prod["url"].to_pylist()) == set(oracle_side["url"].to_pylist())
        bloom = to_arrow(dd.dedup_incremental_bloom(SF_SMALL, self.PROD))
        assert set(bloom["url"].to_pylist()) <= set(prod["url"].to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_null_text_matches_sql_semantics():
    """ADVICE r4: null text rows contribute ZERO tokens (SQL's
    unnest(string_split(NULL,' ')) emits no rows) — not one ""-token each.
    The sf fixture has no nulls, so pin it against a live DuckDB oracle on
    a null-bearing corpus here."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from virtuoso_quad_log_ray.stages import sketches as sk

    texts = ["hot hot hot cold", "hot hot warm", None, None, "hot cool"]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    got = {
        r["term"]: r["n_occurrences"]
        for r in to_arrow(
            sk.heavy_hitters_over(ray.data.from_arrow(t), phi=0.25)
        ).to_pylist()
    }
    con = duckdb.connect()
    con.register("pages_null", t)
    expect = dict(
        con.sql(
            "WITH toks AS (SELECT unnest(string_split(text,' ')) AS term FROM pages_null),"
            " tot AS (SELECT count(*)::DOUBLE AS n FROM toks)"
            " SELECT term, count(*)::BIGINT FROM toks GROUP BY term"
            " HAVING count(*) >= (SELECT CAST(ceil(0.25*n) AS BIGINT) FROM tot)"
        ).fetchall()
    )
    con.close()
    # 9 tokens total, min_count=3: only "hot" (6x) survives; with the old
    # fill_null("") there were 11 tokens, min_count 3, same winner — the
    # distinguishing case is the total/threshold shift at the boundary
    assert got == expect and got == {"hot": 6}


@pytest.mark.usefixtures("ray_session")
class TestProductionHashModeRemaining:
    """Production-mode invariants for the remaining _url_key_int consumers
    (contamination, pack_plan, corpus_curate): the selection keys change,
    the structural contracts must not."""

    from virtuoso_quad_log_ray.config import EngineConfig as _EC

    PROD = _EC(oracle_mode=False)

    def test_contamination_covers_all_train_pages(self):
        from virtuoso_quad_log_ray.sources.pages import read_pages

        prod = to_arrow(tx.contamination(SF_SMALL, self.PROD))
        n_pages = read_pages(SF_SMALL, include_html=False).count()
        # every NON-eval page gets exactly one row; eval slice is ~1/16
        assert 0 < len(prod) < n_pages
        assert len(set(prod["url"].to_pylist())) == len(prod)
        again = to_arrow(tx.contamination(SF_SMALL, self.PROD))
        assert sorted(prod["url"].to_pylist()) == sorted(again["url"].to_pylist())

    def test_pack_plan_is_consistent_concat_chunk_layout(self):
        """pack_plan is concat-and-chunk: within a shard, docs laid
        end-to-end in url order, bin = start_offset // budget. Recompute
        the prefix sums from the emitted (shard, url, n_tokens) and check
        every bin_id — the layout invariant, valid under either hash mode."""
        import collections

        prod = to_arrow(tx.pack_plan(SF_SMALL, self.PROD))
        assert len(prod) > 0
        rows = sorted(
            zip(
                prod["shard"].to_pylist(),
                prod["url"].to_pylist(),
                prod["n_tokens"].to_pylist(),
                prod["bin_id"].to_pylist(),
            )
        )
        offset: dict = collections.defaultdict(int)
        for s, u, n, b in rows:
            assert b == offset[s] // tx.PACK_BUDGET_TOKENS, (s, u)
            offset[s] += n

    def test_corpus_curate_same_survivors_different_shards(self):
        oracle_side = to_arrow(tx.corpus_curate(SF_SMALL))
        prod = to_arrow(tx.corpus_curate(SF_SMALL, self.PROD))
        # the quality gate and keep-first dedup are hash-independent: the
        # SURVIVOR SET matches; only the shard assignment permutes
        assert sorted(prod["url"].to_pylist()) == sorted(oracle_side["url"].to_pylist())
        assert all(0 <= s < 16 for s in prod["shard"].to_pylist())

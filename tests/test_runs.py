"""Dump + incremental sync orchestration (pipelines/runs.py): cursor gating,
idempotence, manifest counters, and end-to-end patch-file correctness."""

import os

import pytest

from tests.conftest import SF_SMALL
from virtuoso_quad_log_ray.config import EngineConfig
from virtuoso_quad_log_ray.pipelines import runs
from virtuoso_quad_log_ray.pipelines.publish import Bundler
from virtuoso_quad_log_ray.rdfpatch import TS14_ZERO, parse_patch_text
from virtuoso_quad_log_ray.state import checkpoint as ckpt
from virtuoso_quad_log_ray.state.manifest import load_manifest

CFG = EngineConfig(max_quads_per_file=5000)


@pytest.mark.usefixtures("ray_session")
class TestRuns:
    def test_dump_then_sync_lifecycle(self, tmp_path):
        root = str(tmp_path / "sink")

        # --- dump run ---
        m0 = runs.run_dump(SF_SMALL, root, epoch="E1", cfg=CFG)
        assert m0.kind == "dump"
        assert m0.checkpoint == TS14_ZERO
        assert m0.quad_count > 0
        assert ckpt.read_cursor(root) == TS14_ZERO
        assert ckpt.read_epoch(root) == "E1"

        # dump is idempotent (vql_rdfdump_info marker analog)
        m0b = runs.run_dump(SF_SMALL, root, epoch="E2", cfg=CFG)
        assert m0b.quad_count == m0.quad_count
        assert ckpt.read_epoch(root) == "E1"  # untouched

        # sync before/at cursor is rejected
        with pytest.raises(RuntimeError):
            runs.run_sync(SF_SMALL, root, checkpoint=TS14_ZERO, cfg=CFG)

        # --- sync run ---
        m1 = runs.run_sync(SF_SMALL, root, checkpoint="20240101010101", cfg=CFG)
        assert m1.kind == "sync"
        assert m1.run_index == 1
        assert ckpt.read_cursor(root) == "20240101010101"
        # totals accumulate across runs (A3 counters)
        assert m1.total_quads == m0.quad_count + m1.quad_count
        assert m1.total_files == m0.file_count + m1.file_count
        # changelog contains both ops
        sync_files = [f for f in m1.files if f.name not in {x.name for x in m0.files}]
        ops = set()
        for fe in sync_files[:20]:
            with open(os.path.join(root, fe.name)) as fh:
                quads, meta = parse_patch_text(fh.read())
            assert meta["at checkpoint"] == "20240101010101"
            ops.update(q["op"] for q in quads)
        assert ops <= {"+", "-"} and ops

        # --- publish over the committed manifest ---
        pub = str(tmp_path / "pub")
        st = Bundler(root, pub, max_files=50).publish()
        assert st.def_count + st.end_count >= 1
        man = load_manifest(root)
        assert man.run_index == 1

    def test_run_loop_dump_then_syncs(self, tmp_path):
        """T8 poll loop (entrypoint.sh:14-17): dump first, then interval
        syncs; cursor advances per run; empty-diff re-poll commits 0 records;
        sleep happens BETWEEN runs only."""
        import datetime

        root = str(tmp_path / "sink")
        sleeps: list[float] = []
        times = iter(
            datetime.datetime(2025, 1, 1, 0, 0, i, tzinfo=datetime.timezone.utc)
            for i in range(10)
        )
        mans = runs.run_loop(
            SF_SMALL,
            root,
            interval_s=5.0,
            max_runs=3,
            cfg=CFG,
            sleep=sleeps.append,
            now=lambda: next(times),
        )
        assert [m.kind for m in mans] == ["dump", "sync", "sync"]
        assert mans[0].quad_count > 0
        assert mans[1].quad_count > 0  # v1 -> v2: real changes
        assert mans[2].quad_count == 0  # v2 -> v2: no upstream change
        assert sleeps == [5.0, 5.0]
        assert [m.run_index for m in mans] == [0, 1, 2]
        # cursor advanced to the last sync's checkpoint
        assert ckpt.read_cursor(root) == mans[2].checkpoint
        assert mans[1].checkpoint < mans[2].checkpoint

    def test_snapshot_checkpoint_sync(self, tmp_path):
        """Snapshot-backed sync: run_dump materializes the quad set, run_sync
        diffs against the STORED snapshot (no recompute of the prior crawl)
        and produces the exact same changelog as the recompute path; the
        SNAPSHOT pointer advances; manifests carry throughput metrics."""
        plain, snap = str(tmp_path / "plain"), str(tmp_path / "snap")
        snaps = str(tmp_path / "snapshots")

        m_plain = runs.run_dump(SF_SMALL, plain, epoch="E1", cfg=CFG)
        runs.run_sync(SF_SMALL, plain, checkpoint="20240101010101", cfg=CFG)

        m_snap = runs.run_dump(SF_SMALL, snap, epoch="E1", cfg=CFG, snapshot_root=snaps)
        assert m_snap.quad_count == m_plain.quad_count
        with open(os.path.join(snaps, "SNAPSHOT")) as f:
            assert f.read().strip() == "at-" + TS14_ZERO
        s1 = runs.run_sync(
            SF_SMALL, snap, checkpoint="20240101010101", cfg=CFG, snapshot_root=snaps
        )
        with open(os.path.join(snaps, "SNAPSHOT")) as f:
            assert f.read().strip() == "at-20240101010101"
        # identical changelog vs the recompute path (same files, same md5s)
        p_files = {
            (f.name, f.md5) for f in load_manifest(plain).files if "20240101010101" in f.name
        }
        s_files = {
            (f.name, f.md5) for f in load_manifest(snap).files if "20240101010101" in f.name
        }
        assert p_files == s_files and p_files
        assert s1.elapsed_s > 0 and s1.quads_per_sec >= 0

    def test_sync_crash_before_patch_commit_replays_full_delta(
        self, tmp_path, monkeypatch
    ):
        """ADVICE r2 (high): a crash AFTER the new snapshot materializes but
        BEFORE the patch manifest commits must leave the SNAPSHOT pointer at
        the prior state, so the retry re-diffs old-vs-new and publishes the
        full delta (not an empty new-vs-new changelog)."""
        snap = str(tmp_path / "sink")
        snaps = str(tmp_path / "snapshots")
        runs.run_dump(SF_SMALL, snap, epoch="E1", cfg=CFG, snapshot_root=snaps)

        calls = {"n": 0}
        real = runs.write_rdfpatch

        def crashing_write(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("simulated crash before patch commit")
            return real(*a, **k)

        monkeypatch.setattr(runs, "write_rdfpatch", crashing_write)
        with pytest.raises(RuntimeError, match="simulated crash"):
            runs.run_sync(
                SF_SMALL, snap, checkpoint="20240101010101", cfg=CFG,
                snapshot_root=snaps,
            )
        # pointer must still name the OLD snapshot; cursor unmoved
        with open(os.path.join(snaps, "SNAPSHOT")) as f:
            assert f.read().strip() == "at-" + TS14_ZERO
        assert ckpt.read_cursor(snap) == TS14_ZERO

        # retry replays idempotently and emits the real delta
        m = runs.run_sync(
            SF_SMALL, snap, checkpoint="20240101010101", cfg=CFG,
            snapshot_root=snaps,
        )
        assert m.quad_count > 0  # v1 -> v2 delta, NOT empty
        with open(os.path.join(snaps, "SNAPSHOT")) as f:
            assert f.read().strip() == "at-20240101010101"
        assert ckpt.read_cursor(snap) == "20240101010101"
        # delta identical to a never-crashed recompute run
        plain = str(tmp_path / "plain")
        runs.run_dump(SF_SMALL, plain, epoch="E1", cfg=CFG)
        runs.run_sync(SF_SMALL, plain, checkpoint="20240101010101", cfg=CFG)
        want = {
            (f.name, f.md5)
            for f in load_manifest(plain).files
            if "20240101010101" in f.name
        }
        got = {
            (f.name, f.md5)
            for f in load_manifest(snap).files
            if "20240101010101" in f.name
        }
        assert got == want and got

    def test_sync_crash_between_manifest_and_cursor_no_duplicates(
        self, tmp_path, monkeypatch
    ):
        """VERDICT r3 #1 (T1/T3): a crash AFTER the patch manifest commits
        but BEFORE the cursor write must NOT double-list the run's files on
        retry. The retry at the same checkpoint is repaired from the
        manifest-authoritative checkpoint: cursor + snapshot pointer are
        backfilled, nothing is re-published, totals stay exact, and
        read_rdfpatch ingests every quad exactly once."""
        from tests.conftest import to_arrow
        from virtuoso_quad_log_ray.sources.rdfpatch_files import read_rdfpatch

        sink = str(tmp_path / "sink")
        snaps = str(tmp_path / "snapshots")
        runs.run_dump(SF_SMALL, sink, epoch="E1", cfg=CFG, snapshot_root=snaps)

        real_write = ckpt.write_cursor
        calls = {"n": 0}

        def crashing_cursor(root, ts):
            if ts == "20240101010101" and calls["n"] == 0:
                calls["n"] += 1
                raise RuntimeError("simulated crash after manifest commit")
            return real_write(root, ts)

        monkeypatch.setattr(runs.ckpt, "write_cursor", crashing_cursor)
        with pytest.raises(RuntimeError, match="simulated crash"):
            runs.run_sync(
                SF_SMALL, sink, checkpoint="20240101010101", cfg=CFG,
                snapshot_root=snaps,
            )
        # the crash window: manifest committed, cursor + pointer stale
        committed = load_manifest(sink)
        assert committed.checkpoint == "20240101010101"
        assert ckpt.read_cursor(sink) == TS14_ZERO
        with open(os.path.join(snaps, "SNAPSHOT")) as f:
            assert f.read().strip() == "at-" + TS14_ZERO

        # retry at the same checkpoint repairs instead of re-publishing
        m = runs.run_sync(
            SF_SMALL, sink, checkpoint="20240101010101", cfg=CFG,
            snapshot_root=snaps,
        )
        names = [f.name for f in m.files]
        assert len(names) == len(set(names))  # no duplicate manifest entries
        assert m.quad_count == committed.quad_count
        assert m.total_quads == sum(f.amount for f in m.files)
        assert m.total_files == len(m.files)
        assert m.run_index == committed.run_index  # same committed run
        assert ckpt.read_cursor(sink) == "20240101010101"
        with open(os.path.join(snaps, "SNAPSHOT")) as f:
            assert f.read().strip() == "at-20240101010101"
        # every published quad is ingested exactly once
        back = to_arrow(read_rdfpatch(sink))
        assert len(back) == m.total_quads
        # exact parity with a never-crashed run
        plain = str(tmp_path / "plain")
        runs.run_dump(SF_SMALL, plain, epoch="E1", cfg=CFG)
        mp = runs.run_sync(SF_SMALL, plain, checkpoint="20240101010101", cfg=CFG)
        assert {(f.name, f.md5) for f in m.files} == {
            (f.name, f.md5) for f in mp.files
        }
        assert m.total_quads == mp.total_quads

    def test_sync_bootstraps_missing_snapshot(self, tmp_path):
        """ADVICE r2 (low): run_sync with snapshot_root set but no snapshot
        (dump ran without one) bootstraps the snapshot from the committed
        prev state instead of silently recomputing forever."""
        sink = str(tmp_path / "sink")
        snaps = str(tmp_path / "snapshots")
        runs.run_dump(SF_SMALL, sink, epoch="E1", cfg=CFG)  # NO snapshot_root
        assert not os.path.exists(os.path.join(snaps, "SNAPSHOT"))
        m = runs.run_sync(
            SF_SMALL, sink, checkpoint="20240101010101", cfg=CFG,
            snapshot_root=snaps,
        )
        assert m.quad_count > 0
        # snapshot now exists and points at the new state
        with open(os.path.join(snaps, "SNAPSHOT")) as f:
            assert f.read().strip() == "at-20240101010101"
        # the bootstrapped prev snapshot produced the SAME changelog as the
        # recompute path
        plain = str(tmp_path / "plain")
        runs.run_dump(SF_SMALL, plain, epoch="E1", cfg=CFG)
        runs.run_sync(SF_SMALL, plain, checkpoint="20240101010101", cfg=CFG)
        want = {
            (f.name, f.md5)
            for f in load_manifest(plain).files
            if "20240101010101" in f.name
        }
        got = {
            (f.name, f.md5)
            for f in load_manifest(sink).files
            if "20240101010101" in f.name
        }
        assert got == want and got

    def test_roundtrip_read_back(self, tmp_path):
        """write_rdfpatch -> read_rdfpatch reproduces the quad multiset
        (publication-surface round-trip; apply() semantics live in
        test_rdfpatch)."""
        from tests.conftest import to_arrow
        from virtuoso_quad_log_ray.pipelines.changelog import quads_version
        from virtuoso_quad_log_ray.sources.rdfpatch_files import read_rdfpatch

        root = str(tmp_path / "sink")
        m = runs.run_dump(SF_SMALL, root, epoch="E1", cfg=CFG)
        back = to_arrow(read_rdfpatch(root))
        assert len(back) == m.quad_count
        assert set(back["op"].to_pylist()) == {"+"}
        # same quad set as the v1 snapshot the dump ran over
        quads = to_arrow(quads_version(SF_SMALL, 1, CFG))
        want = set(zip(*[quads[c].to_pylist() for c in ("s", "p", "o", "g")]))
        got = set(zip(*[back[c].to_pylist() for c in ("s", "p", "o", "g")]))
        assert got == want

    def test_sync_requires_dump(self, tmp_path):
        with pytest.raises(RuntimeError):
            runs.run_sync(SF_SMALL, str(tmp_path / "x"), checkpoint="20240101010101", cfg=CFG)


class TestValidation:
    """C1-C6 analog startup checks (state/validate.py)."""

    def test_missing_input_table(self, tmp_path):
        from virtuoso_quad_log_ray.state.validate import ValidationError, validate_input

        with pytest.raises(ValidationError):
            validate_input(str(tmp_path))

    def test_input_schema_ok(self):
        from virtuoso_quad_log_ray.state.validate import validate_input

        validate_input(SF_SMALL)  # no raise

    def test_sink_size_drift_detected(self, tmp_path):
        from virtuoso_quad_log_ray.state.manifest import FileEntry, RunManifest, commit_manifest
        from virtuoso_quad_log_ray.state.validate import ValidationError, validate_sink

        root = str(tmp_path / "sink")
        os.makedirs(root)
        with open(os.path.join(root, "rdf_out_x"), "w") as f:
            f.write("short")
        commit_manifest(
            root,
            RunManifest(
                epoch="E", checkpoint="00000000000000", kind="dump",
                files=[FileEntry("rdf_out_x", "g", 1, "m", 9999)],
            ),
        )
        with pytest.raises(ValidationError):
            validate_sink(root)

    def test_malformed_cursor_detected(self, tmp_path):
        from virtuoso_quad_log_ray.state import checkpoint as ckpt
        from virtuoso_quad_log_ray.state.validate import ValidationError, validate_sink

        root = str(tmp_path / "s")
        ckpt.write_cursor(root, "not-a-ts14")
        with pytest.raises(ValidationError):
            validate_sink(root)

    def test_snapshot_probe_detects_change(self):
        from virtuoso_quad_log_ray.state.validate import SnapshotProbe, ValidationError

        a = SnapshotProbe(n_rows=10, max_doc_id=9)
        a.assert_unchanged(SnapshotProbe(n_rows=10, max_doc_id=9))  # ok
        with pytest.raises(ValidationError):
            a.assert_unchanged(SnapshotProbe(n_rows=11, max_doc_id=10))


class TestRealPagesRuns:
    """Production loop over a real pages table: dump checkpoints the quad
    set, sync re-extracts the CURRENT table and diffs against the stored
    snapshot (no recompute of the prior crawl)."""

    def test_dump_then_sync_over_mutated_pages(self, tmp_path):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from virtuoso_quad_log_ray.rdfpatch import TS14_ZERO
        from virtuoso_quad_log_ray.sources.pages import read_pages

        pages = (
            __import__("tests.conftest", fromlist=["to_arrow"]).to_arrow(
                read_pages(SF_SMALL, include_html=True)
            )
        )
        path = str(tmp_path / "pages.parquet")
        pq.write_table(pages, path)
        sink = str(tmp_path / "sink")
        snaps = str(tmp_path / "snaps")

        m0 = runs.run_dump_pages(path, sink, epoch="E1", cfg=CFG, snapshot_root=snaps)
        assert m0.kind == "dump" and m0.quad_count > 0
        assert ckpt.read_cursor(sink) == TS14_ZERO

        # mutate the source: drop one page, change another's text
        urls = pages["url"].to_pylist()
        keep = pc.not_equal(pages["url"], urls[0])
        mutated = pages.filter(keep)
        text = pc.if_else(
            pc.equal(mutated["url"], urls[1]),
            pc.binary_join_element_wise(mutated["text"], " changed", ""),
            mutated["text"],
        )
        mutated = mutated.set_column(
            mutated.schema.get_field_index("text"), "text", text
        )
        pq.write_table(mutated, path)

        m1 = runs.run_sync_pages(
            path, sink, checkpoint="20250101000000", snapshot_root=snaps, cfg=CFG
        )
        assert m1.kind == "sync" and m1.quad_count > 0  # deletions + changes
        assert ckpt.read_cursor(sink) == "20250101000000"
        # the changelog must contain '-' records for the dropped page's quads
        sync_files = [f for f in m1.files if "20250101000000" in f.name]
        ops = set()
        for fe in sync_files[:20]:
            import os as _os

            with open(_os.path.join(sink, fe.name)) as fh:
                rows, _ = parse_patch_text(fh.read())
            ops.update(r["op"] for r in rows)
        assert "-" in ops

        # unchanged re-poll: empty changelog, cursor still advances
        m2 = runs.run_sync_pages(
            path, sink, checkpoint="20250101000001", snapshot_root=snaps, cfg=CFG
        )
        assert m2.quad_count == 0
        assert ckpt.read_cursor(sink) == "20250101000001"

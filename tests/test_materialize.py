"""Sorted Parquet adjacency partitions: layout, sort order, resume skip."""

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL, to_arrow
from virtuoso_quad_log_ray.pipelines import kg
from virtuoso_quad_log_ray.pipelines.materialize import (
    materialize_quads,
    read_materialized,
)


@pytest.mark.usefixtures("ray_session")
class TestMaterialize:
    def test_write_read_roundtrip_sorted(self, tmp_path):
        root = str(tmp_path / "adj")
        quads = kg.dedup_quads(kg.build_quads(SF_SMALL))
        expected = quads.count()
        quads = kg.dedup_quads(kg.build_quads(SF_SMALL))  # count() consumed the plan
        m = materialize_quads(quads, root, epoch="E1", n_buckets=8)
        assert m.file_count <= 8
        assert m.quad_count == expected

        # each partition file is sorted by (g, s, p, o)
        for e in m.files:
            t = pq.read_table(os.path.join(root, e.name))
            rows = list(zip(*[t[c].to_pylist() for c in ("g", "s", "p", "o")]))
            assert rows == sorted(rows), e.name

        # every graph lives in exactly one partition
        graph_to_files = {}
        for e in m.files:
            t = pq.read_table(os.path.join(root, e.name), columns=["g"])
            for g in set(t["g"].to_pylist()):
                graph_to_files.setdefault(g, set()).add(e.name)
        assert all(len(v) == 1 for v in graph_to_files.values())

        back = to_arrow(read_materialized(root))
        assert len(back) == m.quad_count

    def test_resume_skips_committed_buckets(self, tmp_path):
        root = str(tmp_path / "adj")
        quads = kg.dedup_quads(kg.build_quads(SF_SMALL))
        materialize_quads(quads, root, epoch="E1", n_buckets=4)
        mtimes = {
            e: os.path.getmtime(os.path.join(root, e))
            for e in os.listdir(root)
            if e.startswith("bucket=")
        }
        from virtuoso_quad_log_ray.state.manifest import load_manifest

        m1 = load_manifest(root)
        quads2 = kg.dedup_quads(kg.build_quads(SF_SMALL))
        m2 = materialize_quads(quads2, root, epoch="E1", n_buckets=4)
        # same epoch: all buckets skipped, files untouched, totals unchanged
        for e in mtimes:
            assert os.path.getmtime(os.path.join(root, e)) == mtimes[e]
        assert m2.quad_count == m1.quad_count
        assert m2.file_count == m1.file_count == 4

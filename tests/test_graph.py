"""PageRank over the entity co-occurrence graph: both execution paths
against an independent dense reference, plus invariants."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests.conftest import SF_SMALL, to_arrow
from virtuoso_quad_log_ray.pipelines import kg
from virtuoso_quad_log_ray.stages import graph


def _dense_reference(edges, iters=20, damping=0.85):
    """Independent dense implementation (explicit transition matrix)."""
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    m = np.zeros((n, n))
    for a, b, w in edges:
        m[idx[a], idx[b]] += w
        m[idx[b], idx[a]] += w
    p = m / m.sum(axis=1, keepdims=True)  # row-stochastic
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - damping) / n + damping * (p.T @ r)
    return dict(zip(nodes, r))


EDGES = [
    ("a", "b", 3.0),
    ("a", "c", 1.0),
    ("b", "c", 1.0),
    ("c", "d", 2.0),
    ("d", "e", 1.0),
    ("x", "y", 5.0),  # second component
]


def _edges_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "node_a": pa.array([e[0] for e in EDGES]),
                "node_b": pa.array([e[1] for e in EDGES]),
                "w": pa.array([e[2] for e in EDGES]),
            }
        )
    )


@pytest.mark.usefixtures("ray_session")
class TestPagerank:
    def test_driver_path_matches_dense_reference(self):
        got = to_arrow(graph.pagerank(_edges_ds()))
        ref = _dense_reference(EDGES)
        assert sorted(got["node"].to_pylist()) == sorted(ref)
        for n, r in zip(got["node"].to_pylist(), got["rank"].to_pylist()):
            assert abs(r - ref[n]) < 1e-12, (n, r, ref[n])

    def test_distributed_path_matches_driver_path(self):
        drv = to_arrow(graph.pagerank(_edges_ds()))
        dst = to_arrow(graph.pagerank(_edges_ds(), driver_threshold=0))
        a = dict(zip(drv["node"].to_pylist(), drv["rank"].to_pylist()))
        b = dict(zip(dst["node"].to_pylist(), dst["rank"].to_pylist()))
        assert sorted(a) == sorted(b)
        for n in a:
            assert abs(a[n] - b[n]) < 1e-9, (n, a[n], b[n])

    def test_ranks_sum_to_one(self):
        got = to_arrow(graph.pagerank(_edges_ds()))
        assert abs(sum(got["rank"].to_pylist()) - 1.0) < 1e-9

    def test_hub_ranks_highest_on_star(self):
        star = ray.data.from_arrow(
            pa.table(
                {
                    "node_a": pa.array(["hub"] * 5),
                    "node_b": pa.array([f"leaf{i}" for i in range(5)]),
                    "w": pa.array([1.0] * 5),
                }
            )
        )
        got = to_arrow(graph.pagerank(star))
        ranks = dict(zip(got["node"].to_pylist(), got["rank"].to_pylist()))
        assert ranks["hub"] == max(ranks.values())

    def test_empty_edges(self):
        empty = ray.data.from_arrow(
            pa.table(
                {
                    "node_a": pa.array([], type=pa.string()),
                    "node_b": pa.array([], type=pa.string()),
                    "w": pa.array([], type=pa.float64()),
                }
            )
        )
        assert to_arrow(graph.pagerank(empty)).num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestEntityPagerank:
    def test_covers_cooccur_nodes_and_paths_agree(self):
        ranks = to_arrow(kg.entity_pagerank(SF_SMALL))
        co = to_arrow(kg.entity_cooccur(SF_SMALL))
        nodes = set(co["canon_a"].to_pylist()) | set(co["canon_b"].to_pylist())
        assert set(ranks["canon"].to_pylist()) == nodes
        assert abs(sum(ranks["rank"].to_pylist()) - 1.0) < 1e-9
        # the distributed fixpoint produces the same scores on real data
        dist = to_arrow(kg.entity_pagerank(SF_SMALL, driver_threshold=0))
        a = dict(zip(ranks["canon"].to_pylist(), ranks["rank"].to_pylist()))
        b = dict(zip(dist["canon"].to_pylist(), dist["rank"].to_pylist()))
        assert sorted(a) == sorted(b)
        for n in a:
            assert abs(a[n] - b[n]) < 1e-9

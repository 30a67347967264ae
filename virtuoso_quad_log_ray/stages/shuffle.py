"""Shared shuffle/join sizing.

Ray Data's hash join spawns one aggregator ACTOR per partition (default 1
logical CPU each). Two failure modes if sized naively:

  * partitions > free cores  -> the aggregators never all schedule and the
    pipeline deadlocks silently (observed in this sandbox at 4-8 CPUs);
  * partitions << cores      -> the join is under-parallelized at scale.

Policy: partitions = min(configured cap, live cluster CPUs / 2), floor 2,
and aggregators request 0.5 CPU so upstream map/read tasks can always make
progress alongside a full aggregator fleet. On a 256-node cluster the cap
(EngineConfig.num_shuffle_partitions) dominates; in the sandbox the CPU
count does.
"""

from __future__ import annotations

from typing import Any

import ray

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig


def cluster_cpus(default: int = 4) -> int:
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def join_partitions(cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    return max(2, min(cfg.num_shuffle_partitions, cluster_cpus() // 2))


def join_kwargs(cfg: EngineConfig = DEFAULT_CONFIG, *, small: bool = False) -> dict[str, Any]:
    """kwargs for Dataset.join: partition count + fractional-CPU aggregators.

    ``small=True`` is for joins whose probe side is metadata-sized (e.g.
    verified candidate pairs — proportional to the duplicate set, not the
    corpus): each partition is an aggregator ACTOR with startup latency, so
    a 16-way fleet on a thousand-row join is pure overhead.
    """
    parts = max(2, join_partitions(cfg) // 4) if small else join_partitions(cfg)
    return {
        "num_partitions": parts,
        "aggregator_ray_remote_args": {"num_cpus": 0.5},
    }


def actor_kwargs(*, batch_size: int = 2048, max_pool: int | None = None) -> dict[str, Any]:
    """kwargs for actor-pool ``map_batches`` stages.

    Every actor requests 0.5 CPU: a pipeline stacking several actor-pool
    stages plus join/shuffle aggregators must never reserve every core, or
    the task-pool operators feeding the actors starve and the pipeline
    deadlocks (observed at num_cpus=4: 4/4 CPU held by actors, read tasks
    pending forever). Fractional actors keep >= 1 core schedulable for
    tasks at any pool size; pool max scales with the cluster.

    The pool MIN also scales with the cluster (cpus/2 actors = cpus/4
    reserved CPUs): an autoscaling pool starting at 1 actor ramps ~1 actor/s,
    so a pool that must grow from 1 throttles the whole pipeline via
    backpressure for the first minute — measured: the headline stage showed
    ZERO speedup from 2 to 8 CPUs until the floor was raised, and average
    actor concurrency stayed at ~2 of 7 with a floor of cpus/4.
    """
    cpus = cluster_cpus()
    hi = max_pool or max(2, cpus - 1)
    # floor cpus//2 (not cpus-1): pipelines stacking TWO actor pools plus
    # join aggregators at small cpu counts must leave >= 1 whole CPU of
    # headroom for task operators or they deadlock (see module docstring).
    lo = min(max(1, cpus // 2), hi)
    return {
        "concurrency": (lo, hi),
        "batch_size": batch_size,
        "num_cpus": 0.5,
        "batch_format": "pyarrow",
        "zero_copy_batch": True,
    }


def bucket_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str]],
    *,
    hash_col: str | None = None,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Hash-bucketed groupby-aggregate with a VECTORIZED combine.

    Ray's native ``groupby().aggregate()`` sorts, then combines row by row
    in Python — measured ~100us/row on 2-int64-key Sum+Min aggregates (the
    n-gram pair phase burned ~160 CPU-seconds aggregating ~2M rows; this
    path does the same work in ~3s wall). Rows are hash-partitioned into
    ``n_buckets`` coarse buckets (each key lands wholly in one bucket, so
    per-bucket aggregation is globally correct), and each bucket runs ONE
    pyarrow ``Table.group_by().aggregate()`` — C++ hash aggregation. Same
    exchange volume as the native path, vectorized combine cost.

    ``hash_col`` names an int64 column uniformly distributed across keys
    (e.g. a 64-bit content hash that determines the key); defaults to
    keys[0]. Output columns: keys + pyarrow's "{col}_{fn}" names.
    """
    import numpy as np
    import pyarrow as pa

    nb = n_buckets or max(4, cluster_cpus())
    hc = hash_col or keys[0]

    def add_pk(b: pa.Table) -> pa.Table:
        v = b[hc].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        pk = (v.view(np.uint64) % np.uint64(nb)).view(np.int64)
        return b.append_column("_pk", pa.array(pk))

    def combine(group: pa.Table) -> pa.Table:
        return group.drop_columns(["_pk"]).group_by(keys).aggregate(aggs)

    # num_partitions=nb aligns the sort-shuffle's output partitions with the
    # bucket count (the default over-partitions ~2x: 64 partitions for 32
    # buckets, half guaranteed empty) — measured faster on every aggregate
    # path. Partitions holding no bucket still emit EMPTY blocks with an
    # EMPTY schema (zero columns); see scrub_empty_blocks below for why that
    # matters to downstream joins.
    return (
        ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pk", num_partitions=nb)
        .map_groups(combine, batch_format="pyarrow")
    )


def scrub_empty_blocks(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Drop the zero-column empty blocks a sort-shuffle emits for empty
    partitions. Required between a groupby/``bucket_aggregate`` and a hash
    JOIN consuming its output.

    Ray's groupby sort-shuffle materializes one block per partition; a
    partition that received no keys yields an empty block with an EMPTY
    schema (zero columns — pa.schema([])). Those blocks skip every
    map_batches UDF (Ray never calls fn on zero-row blocks) and survive to
    a downstream hash join, where a join hash-partition whose input happens
    to be all-schemaless concatenates to a zero-column table and acero
    fails loudly: "No match or multiple matches for key field reference".
    Observed at sf0.1 / 32 CPUs (vocabulary < bucket count) in
    tfidf_top_terms; any aggregate whose key cardinality can fall below the
    bucket count is exposed.

    A streaming ``repartition()`` also merges the empties away, but it adds
    an AllToAll barrier that DEADLOCKS low-CPU clusters when stacked
    against join aggregator actors (observed hang at num_cpus=4 in
    embedding_neardup_pairs: join actors reserve the cores the extra
    barrier's tasks need). Instead this materializes — the input must be
    aggregate/key-sized, same contract as ``self_join_input`` — and
    rebuilds the dataset from the surviving block REFS: blocks never leave
    the object store, no driver transit, and the downstream join starts
    from clean typed blocks.

    Every streaming alternative was evaluated and ruled out on Ray 2.49
    (round 5):

      * a retyping ``map_batches`` can NEVER fix an empty block — Ray does
        not invoke map UDFs on zero-row blocks at all (pinned by
        ``test_dedup.py::test_ray_skips_udfs_on_empty_blocks``; if a Ray
        upgrade changes this, that test flags the streaming fix as newly
        possible);
      * seeding the aggregate with one sentinel row per bucket types every
        BUCKET's output, but the sort-shuffle's range boundaries are
        sampled from the row distribution, so key-skewed inputs still leave
        rangeless partitions emitting schemaless blocks;
      * ``repartition(keys=...)`` (true hash partitioning) requires the
        global ``DataContext.shuffle_strategy = HASH_SHUFFLE``, and under
        that strategy the whole suite DEADLOCKS at num_cpus=4 — 16
        HashShuffleAggregator actors sat idle holding the cores the
        upstream map tasks needed (observed; the same hazard class this
        function's materialize exists to avoid).
    """
    m = ds.materialize()
    refs = []
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:  # fully empty aggregate: keep the original (callers guard)
        return m
    return ray.data.from_arrow_refs(refs)


def self_join_input(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Materialize a dataset that feeds BOTH sides of a self-join.

    Ray Data has no common-subexpression reuse: ``ds.join(ds, ...)`` executes
    the upstream twice (two read+compute chains, two actor pools). For the
    compact signature/bucket tables feeding our self-joins this is pure
    waste, so pin the blocks once in the object store. At 100 TB the analog
    is checkpointing the signature table to Parquet and reading it twice —
    either way the exploded/raw input is never materialized, only the
    key table.
    """
    return ds.materialize()

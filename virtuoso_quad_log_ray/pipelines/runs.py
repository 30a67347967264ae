"""Run orchestration: dump + incremental sync micro-batch runs (T1/T2/T7/T8).

The reference's operational loop (quad-logger/entrypoint.sh:14-17 →
generate-rdfpatch.sh:407-427) alternates between one initial full dump and
repeated incremental syncs gated by a checkpoint cursor. This module is that
loop's body for the new engine — each call is one bounded Dataset execution
(the ``ray job submit`` unit):

  run_dump   no dump-info yet (C4/C5 analog: committed manifest absent) ->
             full quad build, all '+' ops, checkpoint ts 00000000000000
             (generate-rdfpatch.sh:210-217), epoch signed (T2), cursor
             written AFTER the manifest commits (T1).
  run_sync   cursor present -> changelog = anti-join(prev snapshot quads,
             current snapshot quads) (J1), written as a sync run with the
             new checkpoint; cursor advances only after commit — a crashed
             run replays idempotently from the old cursor (T5 semantics).

State layout under ``out_root`` (all via state/manifest + state/checkpoint):
  MANIFEST + manifest-*.json   committed files + counters (A1/A3)
  cursor.ts14                  last fully-processed input watermark
  epoch.ts14                   run-lineage handshake token
  <b64(graph)>/rdf_out_*       the published patch files
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig
from virtuoso_quad_log_ray.pipelines.changelog import diff_quads, quads_version
from virtuoso_quad_log_ray.pipelines.publish import write_rdfpatch
from virtuoso_quad_log_ray.rdfpatch import TS14_ZERO
from virtuoso_quad_log_ray.state import checkpoint as ckpt
from virtuoso_quad_log_ray.state.manifest import RunManifest, load_manifest


def _with_op(quads: ray.data.Dataset, op: str) -> ray.data.Dataset:
    def add(b: pa.Table) -> pa.Table:
        return b.append_column("op", pa.array([op] * len(b), type=pa.string()))

    return quads.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Snapshot checkpoints (north_star: "resumable from per-partition
# checkpoints"): each run can persist its canonical quad set as the bucketed
# sorted-Parquet layout (pipelines/materialize.py), and the next sync diffs
# against the STORED prior snapshot instead of recomputing it from source —
# at 100 TB recomputing the previous crawl's extraction is not an option.
# Layout: <snapshot_root>/at-<ts14>/bucket=K/part.parquet + a SNAPSHOT
# pointer file (atomic rename) naming the current snapshot dir; the two most
# recent snapshots are retained for rollback, older ones pruned.
# ---------------------------------------------------------------------------

SNAPSHOT_POINTER = "SNAPSHOT"


def _snapshot_dir(root: str, checkpoint: str) -> str:
    import os

    return os.path.join(root, f"at-{checkpoint}")


def read_snapshot(root: str) -> ray.data.Dataset | None:
    """Quad Dataset of the current committed snapshot, or None."""
    import os

    from virtuoso_quad_log_ray.pipelines.materialize import read_materialized

    ptr = os.path.join(root, SNAPSHOT_POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return read_materialized(os.path.join(root, name))


def materialize_snapshot(
    root: str, quads: ray.data.Dataset, *, checkpoint: str, epoch: str
) -> str:
    """Phase 1 of a snapshot write: materialize the quad set under
    ``at-<checkpoint>`` WITHOUT swinging the SNAPSHOT pointer. Returns the
    snapshot dir name for :func:`commit_snapshot`.

    The split exists because a sync must not make the new state the
    "current snapshot" until its patch manifest + cursor have committed —
    a crash in between would leave the cursor at the old checkpoint but the
    pointer at the new state, so the retry diffs new-vs-new and silently
    drops the old->new delta from the patch stream (ADVICE r2, high).
    """
    import os

    from virtuoso_quad_log_ray.pipelines.materialize import materialize_quads

    os.makedirs(root, exist_ok=True)
    name = f"at-{checkpoint}"
    materialize_quads(quads, os.path.join(root, name), epoch=epoch)
    return name


def commit_snapshot(root: str, name: str) -> None:
    """Phase 2: atomically swing the SNAPSHOT pointer to ``name`` and prune
    all but the two most recent snapshot dirs."""
    import os
    import shutil

    tmp = os.path.join(root, SNAPSHOT_POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, SNAPSHOT_POINTER))
    snaps = sorted(d for d in os.listdir(root) if d.startswith("at-"))
    for stale in snaps[:-2]:
        shutil.rmtree(os.path.join(root, stale), ignore_errors=True)


def write_snapshot(root: str, quads: ray.data.Dataset, *, checkpoint: str, epoch: str):
    """Materialize + commit in one step — safe only when there is no
    in-flight patch run depending on the PREVIOUS snapshot (dump/bootstrap
    paths). Syncs must use the two-phase form."""
    name = materialize_snapshot(root, quads, checkpoint=checkpoint, epoch=epoch)
    commit_snapshot(root, name)


def run_dump(
    sf_dir: str,
    out_root: str,
    *,
    epoch: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    version: int = 1,
    snapshot_root: str | None = None,
) -> RunManifest:
    """Initial full dump: all quads as '+' records at checkpoint 0.

    Idempotent: if a committed dump manifest exists (the vql_rdfdump_info
    marker analog, generate-rdfpatch.sh:277-297), returns it unchanged.
    """
    from virtuoso_quad_log_ray.state.validate import snapshot_probe, validate_input, validate_sink

    validate_input(sf_dir)
    validate_sink(out_root)
    existing = load_manifest(out_root)
    if existing is not None and existing.kind == "dump":
        # Crash-window repair: the manifest commits BEFORE cursor/epoch are
        # written below, so a crash between leaves a committed dump with no
        # cursor — run_sync would then fail forever ("no dump committed
        # yet"). Backfill the missing state instead of returning blind.
        if ckpt.read_epoch(out_root) is None:
            ckpt.write_epoch(out_root, existing.epoch)
        if ckpt.read_cursor(out_root) is None:
            ckpt.write_cursor(out_root, TS14_ZERO)
        return existing
    probe = snapshot_probe(sf_dir)
    quad_set = quads_version(sf_dir, version, cfg)
    if snapshot_root is not None:
        # checkpoint the canonical quad set FIRST (one extraction pass),
        # then feed the patch write from the stored snapshot — the next
        # sync diffs against storage, never a recomputation of this crawl
        write_snapshot(snapshot_root, quad_set, checkpoint=TS14_ZERO, epoch=epoch)
        quad_set = read_snapshot(snapshot_root)
    quads = _with_op(quad_set, "+")
    manifest = write_rdfpatch(
        quads,
        out_root,
        epoch=epoch,
        checkpoint=TS14_ZERO,
        kind="dump",
        cfg=cfg,
        run_index=0,
        last_source=f"{sf_dir}#v{version}",
    )
    # T6 write-quiescence assertion: immutable Parquet makes serializable
    # fencing free, but assert the input really was unchanged during the run
    probe.assert_unchanged(snapshot_probe(sf_dir))
    ckpt.write_epoch(out_root, epoch)
    # cursor written AFTER the manifest commit: crash before this line is
    # repaired by the idempotent early-return above, which backfills the
    # missing cursor/epoch from the committed manifest.
    ckpt.write_cursor(out_root, TS14_ZERO)
    return manifest


def run_sync(
    sf_dir: str,
    out_root: str,
    *,
    checkpoint: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    prev_version: int = 1,
    new_version: int = 2,
    snapshot_root: str | None = None,
) -> RunManifest:
    """One incremental sync: +/- changelog between the prev and current
    snapshots, appended to the sink under the new checkpoint ts.

    Requires a committed dump (cursor present — parse_trx_logs cursor gate,
    generate-rdfpatch.sh:348-351). With ``snapshot_root`` the PREV side is
    the stored snapshot checkpoint (no recomputation of the prior crawl),
    and the new state is checkpointed before the diff.

    Crash-window semantics (ordering is manifest -> cursor -> snapshot
    pointer):

    * crash between manifest commit and cursor write: the retry at the SAME
      checkpoint is repaired below — the committed manifest is authoritative
      (``max_processed_checkpoint``), so the run backfills the cursor (and
      the pending snapshot pointer) and returns without re-publishing
      (VERDICT r3 #1: re-publishing would double-list every file).
    * crash between cursor write and snapshot-pointer swing: the next sync
      diffs the OLD snapshot against a NEWER state and re-emits the
      old->new ops under a new checkpoint — at-least-once duplicates in the
      patch stream, never a lost delta (ADVICE r3). Consumers must apply
      +/- records idempotently (set-semantics apply, as
      ``changelog.apply_changelog`` does); duplicates were chosen over the prior
      ordering's silently DROPPED deltas (ADVICE r2, high).
    """
    from virtuoso_quad_log_ray.state.validate import validate_input, validate_sink

    validate_input(sf_dir)
    validate_sink(out_root)
    cursor = ckpt.read_cursor(out_root)
    if cursor is None:
        raise RuntimeError("no dump committed yet: run_dump first")
    prev_manifest = load_manifest(out_root)
    if (
        prev_manifest is not None
        and checkpoint == prev_manifest.checkpoint
        and checkpoint > cursor
    ):
        # Crash-window repair (VERDICT r3 #1, T1/T3): the manifest for THIS
        # checkpoint already committed — only the cursor write (and possibly
        # the snapshot-pointer swing) was lost. Backfill the lost state and
        # return the committed manifest instead of double-publishing.
        ckpt.write_cursor(out_root, checkpoint)
        if snapshot_root is not None:
            import os

            pend = f"at-{checkpoint}"
            if os.path.isdir(os.path.join(snapshot_root, pend)):
                commit_snapshot(snapshot_root, pend)
        return prev_manifest
    if checkpoint <= cursor:
        raise RuntimeError(f"checkpoint {checkpoint} not after cursor {cursor}")
    new_quads = quads_version(sf_dir, new_version, cfg)
    pending_snapshot: str | None = None
    prev_quads = None
    if snapshot_root is not None:
        import os

        from virtuoso_quad_log_ray.pipelines.materialize import read_materialized

        epoch = ckpt.read_epoch(out_root) or ""
        prev_quads = read_snapshot(snapshot_root)
        if prev_quads is None:
            # Bootstrap (ADVICE r2, low): the dump ran without snapshot_root,
            # so no snapshot exists. Materialize the committed prev state as
            # the snapshot now (full commit — it IS the cursor's state) so
            # snapshotting starts paying off instead of silently recomputing
            # the prior crawl on every sync forever.
            write_snapshot(
                snapshot_root,
                quads_version(sf_dir, prev_version, cfg),
                checkpoint=cursor,
                epoch=epoch,
            )
            prev_quads = read_snapshot(snapshot_root)
        # Two-phase: materialize the NEW state now (one extraction pass, and
        # the diff below reads it from storage), but swing the SNAPSHOT
        # pointer only after the patch manifest + cursor commit — see
        # materialize_snapshot's docstring (ADVICE r2, high).
        pending_snapshot = materialize_snapshot(
            snapshot_root, new_quads, checkpoint=checkpoint, epoch=epoch
        )
        new_quads = read_materialized(os.path.join(snapshot_root, pending_snapshot))
    if prev_quads is None:
        prev_quads = quads_version(sf_dir, prev_version, cfg)
    log = diff_quads(prev_quads, new_quads, cfg)
    manifest = write_rdfpatch(
        log,
        out_root,
        epoch=ckpt.read_epoch(out_root) or "",
        checkpoint=checkpoint,
        kind="sync",
        cfg=cfg,
        run_index=(prev_manifest.run_index + 1) if prev_manifest else 1,
        last_source=f"{sf_dir}#v{new_version}",
    )
    ckpt.write_cursor(out_root, checkpoint)
    if pending_snapshot is not None:
        commit_snapshot(snapshot_root, pending_snapshot)
    return manifest


# ---------------------------------------------------------------------------
# Production loop over a REAL pages table (input_hint schema): the dump
# checkpoints the canonical quad set; every sync re-extracts the CURRENT
# table and diffs it against the stored snapshot — the prior crawl is never
# recomputed. These are the quad-set-generic forms of run_dump/run_sync
# (which keep the sandbox's deterministic v1/v2 snapshot-pair semantics).
# ---------------------------------------------------------------------------


def run_dump_quads(
    quad_set: ray.data.Dataset,
    out_root: str,
    *,
    epoch: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    snapshot_root: str | None = None,
    last_source: str = "",
) -> RunManifest:
    """Initial dump of an arbitrary quad Dataset (idempotent, T1/T2/T5
    semantics identical to run_dump)."""
    from virtuoso_quad_log_ray.state.validate import validate_sink

    validate_sink(out_root)
    existing = load_manifest(out_root)
    if existing is not None and existing.kind == "dump":
        if ckpt.read_epoch(out_root) is None:
            ckpt.write_epoch(out_root, existing.epoch)
        if ckpt.read_cursor(out_root) is None:
            ckpt.write_cursor(out_root, TS14_ZERO)
        return existing
    if snapshot_root is not None:
        write_snapshot(snapshot_root, quad_set, checkpoint=TS14_ZERO, epoch=epoch)
        quad_set = read_snapshot(snapshot_root)
    manifest = write_rdfpatch(
        _with_op(quad_set, "+"),
        out_root,
        epoch=epoch,
        checkpoint=TS14_ZERO,
        kind="dump",
        cfg=cfg,
        run_index=0,
        last_source=last_source,
    )
    ckpt.write_epoch(out_root, epoch)
    ckpt.write_cursor(out_root, TS14_ZERO)
    return manifest


def run_sync_quads(
    new_quads: ray.data.Dataset,
    out_root: str,
    *,
    checkpoint: str,
    snapshot_root: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    last_source: str = "",
) -> RunManifest:
    """Incremental sync of an arbitrary quad Dataset against the STORED
    snapshot (snapshot_root is required — there is no recompute fallback
    for a mutable real-world source). Crash-window semantics identical to
    :func:`run_sync` (see its docstring): same-checkpoint retry after a
    manifest-committed/cursor-lost crash is repaired without re-publishing;
    a cursor-committed/pointer-lost crash yields at-least-once duplicate
    +/- ops on the NEXT sync, never a lost delta."""
    from virtuoso_quad_log_ray.state.validate import validate_sink

    validate_sink(out_root)
    cursor = ckpt.read_cursor(out_root)
    if cursor is None:
        raise RuntimeError("no dump committed yet: run_dump_quads first")
    import os

    prev_manifest = load_manifest(out_root)
    if (
        prev_manifest is not None
        and checkpoint == prev_manifest.checkpoint
        and checkpoint > cursor
    ):
        # Crash-window repair — see run_sync (VERDICT r3 #1).
        ckpt.write_cursor(out_root, checkpoint)
        pend = f"at-{checkpoint}"
        if os.path.isdir(os.path.join(snapshot_root, pend)):
            commit_snapshot(snapshot_root, pend)
        return prev_manifest
    if checkpoint <= cursor:
        raise RuntimeError(f"checkpoint {checkpoint} not after cursor {cursor}")

    from virtuoso_quad_log_ray.pipelines.materialize import read_materialized

    prev_quads = read_snapshot(snapshot_root)
    if prev_quads is None:
        raise RuntimeError("no snapshot checkpoint: dump with snapshot_root first")
    # Two-phase snapshot: materialize the new state, diff against the still-
    # current pointer, and swing the pointer only after patch + cursor commit
    # (crash in between must replay the old->new delta, not lose it).
    pending = materialize_snapshot(
        snapshot_root,
        new_quads,
        checkpoint=checkpoint,
        epoch=ckpt.read_epoch(out_root) or "",
    )
    log = diff_quads(
        prev_quads, read_materialized(os.path.join(snapshot_root, pending)), cfg
    )
    manifest = write_rdfpatch(
        log,
        out_root,
        epoch=ckpt.read_epoch(out_root) or "",
        checkpoint=checkpoint,
        kind="sync",
        cfg=cfg,
        run_index=(prev_manifest.run_index + 1) if prev_manifest else 1,
        last_source=last_source,
    )
    ckpt.write_cursor(out_root, checkpoint)
    commit_snapshot(snapshot_root, pending)
    return manifest


def _pages_quads(pages_path: str, cfg: EngineConfig) -> ray.data.Dataset:
    from virtuoso_quad_log_ray.pipelines.kg import quads_from_pages
    from virtuoso_quad_log_ray.sources.pages import read_pages_parquet

    return quads_from_pages(read_pages_parquet(pages_path), cfg)


def run_dump_pages(
    pages_path: str,
    out_root: str,
    *,
    epoch: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    snapshot_root: str | None = None,
) -> RunManifest:
    """Initial dump over a REAL pages Parquet table (input_hint schema)."""
    return run_dump_quads(
        _pages_quads(pages_path, cfg),
        out_root,
        epoch=epoch,
        cfg=cfg,
        snapshot_root=snapshot_root,
        last_source=pages_path,
    )


def run_sync_pages(
    pages_path: str,
    out_root: str,
    *,
    checkpoint: str,
    snapshot_root: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> RunManifest:
    """Incremental sync: re-extract the CURRENT pages table, diff against
    the stored snapshot, publish the +/- changelog, advance the cursor."""
    return run_sync_quads(
        _pages_quads(pages_path, cfg),
        out_root,
        checkpoint=checkpoint,
        snapshot_root=snapshot_root,
        cfg=cfg,
        last_source=pages_path,
    )


def _version_of(last_source: str) -> int:
    """'<sf_dir>#vN' -> N (the snapshot version a committed run last saw)."""
    _, _, tag = last_source.rpartition("#v")
    return int(tag) if tag.isdigit() else 1


def run_loop(
    sf_dir: str,
    out_root: str,
    *,
    interval_s: float = 0.0,
    max_runs: int | None = None,
    epoch: str | None = None,
    current_version: int = 2,
    cfg: EngineConfig = DEFAULT_CONFIG,
    snapshot_root: str | None = None,
    sleep=None,
    now=None,
) -> list[RunManifest]:
    """T8 poll loop — the reference's operational heartbeat
    (quad-logger/entrypoint.sh:14-17: ``while true; do run; sleep
    RUN_INTERVAL; done``), bounded for the sandbox by ``max_runs``.

    Each iteration is one bounded run (the ``ray job submit`` unit):
    no cursor -> initial dump of snapshot v1; cursor present -> incremental
    sync from the last committed snapshot version to ``current_version``
    (a re-poll with no upstream change diffs vN against vN: zero records,
    cursor still advances — the reference likewise writes nothing when the
    trx log has no new quads). ``sleep``/``now`` are injectable for tests;
    checkpoints come from wall-clock ts14 (strictly increasing, enforced by
    run_sync's cursor gate).
    """
    import datetime as _dt
    import time as _time

    from virtuoso_quad_log_ray.rdfpatch import ts14

    sleep = sleep or _time.sleep
    now = now or (lambda: _dt.datetime.now(_dt.timezone.utc))
    manifests: list[RunManifest] = []
    i = 0
    while max_runs is None or i < max_runs:
        if i:
            sleep(interval_s)
        cursor = ckpt.read_cursor(out_root)
        if cursor is None:
            man = run_dump(
                sf_dir,
                out_root,
                epoch=epoch or ts14(now()),
                cfg=cfg,
                version=1,
                snapshot_root=snapshot_root,
            )
        else:
            prev = load_manifest(out_root)
            prev_version = _version_of(prev.last_source) if prev else 1
            man = run_sync(
                sf_dir,
                out_root,
                checkpoint=ts14(now()),
                cfg=cfg,
                prev_version=prev_version,
                new_version=current_version,
                snapshot_root=snapshot_root,
            )
        manifests.append(man)
        i += 1
    return manifests

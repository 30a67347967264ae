"""Run manifests — the commit/visibility protocol.

Replaces the reference's flat-file state + sham-sentinel atomicity:

- sham file ``rdf_out_99999999999999-99999999999999`` gating consumption of
  the last file (generate-rdfpatch.sh:53-54, 259-261; consumer skip logic
  synchronizer.py:157-163, split-graphs.sh:127-133)  ->  readers list a
  COMMITTED manifest, never the directory; uncommitted files are invisible.
- ``vql_lastlogsuffix.txt`` cursor / ``vql_started_at.txt`` epoch /
  ``vql_nquads_count.txt`` totals (generate-rdfpatch.sh:44-63)  ->  fields of
  the manifest + a tiny pointer file updated by atomic rename.

A manifest commit is: write ``manifest-<n>.json.tmp`` -> fsync-rename ->
rename pointer ``MANIFEST`` to the new name (single-file atomic swap). A
crashed run leaves ``*.tmp`` and orphan data files that the next run ignores
(T5 rollback semantics, zipsynchronizer.py:69-109, for free).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class FileEntry:
    """One committed rdfpatch file (ResourceList record analog,
    synchronizer.py:152-177: uri, md5, length, lastmod)."""

    name: str  # path relative to the sink root, e.g. "<b64(g)>/rdf_out_...-00000000000000"
    graph: str
    amount: int
    md5: str
    length: int


@dataclass
class RunManifest:
    epoch: str  # handshake token (vql_started_at analog)
    checkpoint: str  # ts14 the run is 'at' (vql_lastlogsuffix analog)
    kind: str  # 'dump' | 'sync'
    quad_count: int = 0
    file_count: int = 0
    run_index: int = 0
    last_source: str = ""  # '# last trx log' analog (max input warc_ts seen)
    total_quads: int = 0  # running totals across runs (A3 counters)
    total_files: int = 0
    files: list[FileEntry] = field(default_factory=list)
    # lineage + throughput metrics (north_star: "resumable from
    # per-partition checkpoints with lineage and throughput metrics");
    # defaults keep pre-metric manifests loadable.
    elapsed_s: float = 0.0
    quads_per_sec: float = 0.0
    # fingerprint of the hash128 implementation that keyed persisted bucket
    # ids (materialize layout); same-epoch resume is only valid when it
    # matches the current environment's fingerprint (ADVICE r2).
    hash_fp: str = ""
    # bucket count the committed shards were keyed with; same-epoch resume
    # is only valid when it matches the resuming run's bucket count —
    # default_n_buckets() is CPU-adaptive, so the same epoch on a
    # different-sized host re-keys rows to different buckets while shard
    # names collide (ADVICE r4). 0 = pre-field manifest, never resumable.
    n_buckets: int = 0

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "RunManifest":
        d = json.loads(s)
        d["files"] = [FileEntry(**f) for f in d["files"]]
        return RunManifest(**d)


POINTER = "MANIFEST"


def commit_manifest(root: str, manifest: RunManifest) -> str:
    """Atomically publish a manifest: temp write + rename, then pointer swap.
    Readers that load via load_manifest never observe a partial state."""
    os.makedirs(root, exist_ok=True)
    name = f"manifest-{manifest.run_index:06d}.json"
    tmp = os.path.join(root, name + ".tmp")
    with open(tmp, "w") as f:
        f.write(manifest.to_json())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, name))
    ptr_tmp = os.path.join(root, POINTER + ".tmp")
    with open(ptr_tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.replace(ptr_tmp, os.path.join(root, POINTER))
    return name


def load_manifest(root: str) -> RunManifest | None:
    """The committed view of a sink dir; None if never committed."""
    ptr = os.path.join(root, POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    with open(os.path.join(root, name)) as f:
        return RunManifest.from_json(f.read())

"""rdfpatch file re-ingest source (S6/M7 analog).

Reads a published rdfpatch sink back into a quad Dataset. Listing comes from
the COMMITTED manifest, never the directory — the reference's consumers skip
the alphabetically-last possibly-in-flight file (synchronizer.py:152-177,
split-graphs.sh:127-133); the manifest-commit protocol gives the same
visibility guarantee without the sham-sentinel race (state/manifest.py).

Distributed shape: the manifest's file entries become the input Dataset
(tiny rows), and each task opens + parses its files — the standard
"dataset of paths -> map_batches reader" pattern for a custom text format.
Parsing is the scalar rdfpatch parser (rdfpatch.parse_patch_text): file
re-ingest is a publication-surface path, not the engine's hot path (the
canonical interchange format is Parquet).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from virtuoso_quad_log_ray.rdfpatch import parse_patch_text
from virtuoso_quad_log_ray.state.manifest import load_manifest

READ_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("s", pa.string()),
        ("p", pa.string()),
        ("o", pa.string()),
        ("g", pa.string()),
        ("file", pa.string()),
        ("checkpoint", pa.string()),
    ]
)


def read_rdfpatch(root: str) -> ray.data.Dataset:
    """Committed rdfpatch sink -> Dataset of (op, s, p, o, g, file, checkpoint).

    Returns an empty (schema-stable) Dataset when nothing is committed.
    """
    manifest = load_manifest(root)
    entries = (
        [{"name": e.name, "amount": e.amount} for e in manifest.files] if manifest else []
    )
    if not entries:
        return ray.data.from_arrow(READ_SCHEMA.empty_table())

    paths = ray.data.from_items(entries)

    def parse_files(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in READ_SCHEMA}
        for name, amount in zip(batch["name"].to_pylist(), batch["amount"].to_pylist()):
            with open(os.path.join(root, name), encoding="utf-8") as fh:
                rows, meta = parse_patch_text(fh.read())
            # per-file reconciliation: body must match the manifest amount
            # and the '# amount' header (A4/A6 counters)
            assert len(rows) == amount == int(meta.get("amount", amount)), name
            for r in rows:
                cols["op"].append(r["op"])
                cols["s"].append(r["s"])
                cols["p"].append(r["p"])
                cols["o"].append(r["o"])
                cols["g"].append(r["g"])
                cols["file"].append(name)
                cols["checkpoint"].append(meta.get("at checkpoint", ""))
        return pa.table(
            {f.name: pa.array(cols[f.name], type=f.type) for f in READ_SCHEMA}
        )

    return paths.map_batches(parse_files, batch_format="pyarrow", zero_copy_batch=True)

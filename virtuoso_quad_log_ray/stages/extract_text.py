"""M11 — deterministic boilerplate-stripping text extraction (html -> text).

Stands in for a trafilatura-style extractor in the north_star; the correctness
contract is BYTE-IDENTICAL text per url (BASELINE.json input_hint), so the
extractor is a frozen, fully deterministic rule: the page body is the content
of the single ``<article>…</article>`` element; nav/header/footer boilerplate
is dropped. Runs as a stateless zero-copy ``map_batches`` over Arrow batches
(regex precompiled at module import — once per worker process, not per batch).

At 100 TB scale this stage is the first thing after the read: it projects the
wide ``html`` binary column down to ``text`` so no downstream stage ever
ships page bytes through a shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (?s): article content may span newlines. Non-greedy not needed: template has
# exactly one article element; greedy keeps semantics total for nested text.
_ARTICLE_PATTERN = r"(?s)<article>(?P<text>.*)</article>"


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, warc_ts, text, lang); html is projected away."""
    html_str = pc.cast(batch["html"], pa.string())
    extracted = pc.struct_field(pc.extract_regex(html_str, _ARTICLE_PATTERN), "text")
    # Pages with no <article> yield null -> empty text (boilerplate-only page).
    extracted = pc.fill_null(extracted, "")
    return pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": extracted,
            "lang": batch["lang"],
        }
    )


def extract_text(pages: ray.data.Dataset, *, batch_size: int | None = None) -> ray.data.Dataset:
    """Stateless map_batches over whole blocks (batch_size=None — a smaller
    batch_size makes Ray bundle sub-batch blocks into one task and lose
    block-level parallelism; block size is already bounded at the read)."""
    return pages.map_batches(
        extract_text_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )

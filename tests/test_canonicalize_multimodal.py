"""Connected-components canonicalization, multimodal stages, token counts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests.conftest import SF_SMALL, assert_matches_oracle, to_arrow
from virtuoso_quad_log_ray.config import DEFAULT_CONFIG as cfg
from virtuoso_quad_log_ray.stages import canonicalize as cz
from virtuoso_quad_log_ray.stages import multimodal as mm
from virtuoso_quad_log_ray.stages import textstats as tx


@pytest.mark.usefixtures("ray_session")
class TestCanonicalize:
    def test_connected_components_chain(self):
        """A-B, B-C chained pairs + isolated D-E pair -> two components with
        min-url canon (requires >1 propagation round). Both execution paths
        (driver union-find and distributed label propagation) must agree."""
        want = {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
        for threshold in (2_000_000, 0):  # driver path, then distributed path
            pairs = ray.data.from_arrow(
                pa.table({"url_a": ["b", "a", "d"], "url_b": ["c", "b", "e"]})
            )
            t = to_arrow(cz.connected_components(pairs, driver_threshold=threshold))
            got = dict(zip(t["url"].to_pylist(), t["canon"].to_pylist()))
            assert got == want, f"threshold={threshold}"

    def test_canonicalize_pages_vs_oracle(self, oracle):
        assert_matches_oracle(
            cz.canonicalize_pages(SF_SMALL),
            oracle,
            cz.canonicalize_sql(cfg.jaccard_threshold, cfg.shingle_size),
            ["url"],
        )

    def test_mirror_clones_share_canon(self):
        t = to_arrow(cz.canonicalize_pages(SF_SMALL))
        canon = dict(zip(t["url"].to_pylist(), t["canon_url"].to_pylist()))
        mirrors = [u for u in canon if u.endswith("?mirror=1")]
        assert len(mirrors) == 20
        for u in mirrors:
            base = u[: -len("?mirror=1")]
            # identical text -> J=1 >= tau -> same component; the component
            # min can be even smaller than these two urls when near-dup
            # chains merge other docs in
            assert canon[u] == canon[base] <= min(base, u)


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_media_metadata_vs_oracle(self, oracle):
        assert_matches_oracle(
            mm.media_metadata(SF_SMALL), oracle, mm.MEDIA_METADATA_SQL, ["url"]
        )

    def test_byte_histogram_shape_and_sum(self):
        t = to_arrow(mm.byte_histogram(SF_SMALL))
        meta = to_arrow(mm.media_metadata(SF_SMALL))
        n_bytes = dict(zip(meta["url"].to_pylist(), meta["n_bytes"].to_pylist()))
        assert len(t) == 537
        for url, hist in zip(t["url"].to_pylist()[:50], t["byte_hist"].to_pylist()[:50]):
            assert len(hist) == 16
            assert sum(hist) == n_bytes[url]  # histogram partitions the payload

    def test_frame_sample_layout(self):
        t = to_arrow(mm.frame_sample(SF_SMALL))
        # every sampled frame indexed at stride boundaries, offset consistent
        idx = np.asarray(t["frame_idx"].to_pylist())
        off = np.asarray(t["offset"].to_pylist())
        assert (idx % mm.FRAME_STRIDE == 0).all()
        assert (off == idx * mm.FRAME_SIZE).all()
        assert len(set(t["url"].to_pylist())) == 537  # >= 1 frame per page

    def test_frame_sampler_large_binary_offsets(self):
        """ADVICE r3: a large_binary html column (int64 offsets — the block
        shape of a >2 GB batch) decodes identically to binary, and a
        non-binary column fails loudly instead of emitting garbage."""
        sampler = mm.FrameSampler(frame_size=4, stride=2)
        payloads = [b"a" * 11, b"bcd", b""]
        urls = ["u1", "u2", "u3"]
        small = pa.table(
            {"url": urls, "html": pa.array(payloads, type=pa.binary())}
        )
        large = pa.table(
            {"url": urls, "html": pa.array(payloads, type=pa.large_binary())}
        )
        a, b = sampler(small), sampler(large)
        for col in ("url", "frame_idx", "offset", "digest"):
            assert a[col].to_pylist() == b[col].to_pylist(), col
        assert a["frame"].to_pylist() == b["frame"].to_pylist()
        with pytest.raises(TypeError, match="binary"):
            sampler(pa.table({"url": ["u"], "html": pa.array(["not-bytes"])}))

    def test_decode_stub_raises_without_fake(self):
        stub = mm.ImageDecodeStub()
        with pytest.raises(NotImplementedError):
            stub._decode(b"\x89PNG")

    def test_decode_stub_fake_deterministic(self):
        stub = mm.ImageDecodeStub(fake=True)
        batch = pa.table({"url": ["u1"], "html": [b"payload"]})
        a = stub(batch)
        b = stub(batch)
        assert a["pixels"].to_pylist() == b["pixels"].to_pylist()
        assert len(a["pixels"][0]) == 3


@pytest.mark.usefixtures("ray_session")
class TestTokenCounts:
    def test_vs_oracle(self, oracle):
        assert_matches_oracle(
            tx.token_counts(SF_SMALL), oracle, tx.TOKEN_COUNTS_SQL, ["url"]
        )

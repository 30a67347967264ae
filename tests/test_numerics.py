"""numerics helpers: rounding parity with DuckDB, fsb/list matrix codecs.

No Ray needed — pure numpy/pyarrow/duckdb units (the half-away rule is the
ADVICE r1 fix: np.round is banker's, DuckDB round() is half away from zero).
"""

import duckdb
import numpy as np
import pyarrow as pa

from virtuoso_quad_log_ray.numerics import (
    fsb_from_matrix,
    half_away_int64,
    list_matrix,
    matrix_from_fsb,
    scaled_int_array,
)


def test_half_away_matches_duckdb_on_exact_halves():
    vals = [0.5, 1.5, 2.5, 3.5, -0.5, -1.5, -2.5, 0.499999, 1.2, -1.7, 0.0]
    ours = half_away_int64(np.array(vals)).tolist()
    con = duckdb.connect()
    theirs = [
        int(con.sql(f"SELECT CAST(round({v!r}) AS BIGINT)").fetchone()[0]) for v in vals
    ]
    assert ours == theirs
    # np.round (banker's) would disagree on 0.5 -> 0, 2.5 -> 2
    assert ours[0] == 1 and ours[2] == 3


def test_scaled_int_array_cents():
    arr = pa.array([1.005, 2.675, -3.335])
    # CAST AS DOUBLE mirrors reality: the oracle reads parquet DOUBLE columns
    # (a bare 1.005 literal would be DECIMAL and round differently)
    con = duckdb.connect()
    expect = [
        int(
            con.sql(
                f"SELECT CAST(round(100 * CAST({v!r} AS DOUBLE)) AS BIGINT)"
            ).fetchone()[0]
        )
        for v in [1.005, 2.675, -3.335]
    ]
    assert scaled_int_array(arr, 100).to_pylist() == expect


def test_fsb_matrix_roundtrip_and_slice():
    mat = np.arange(24, dtype=np.uint64).reshape(4, 6)
    fsb = fsb_from_matrix(mat)
    assert fsb.type == pa.binary(48)
    back = matrix_from_fsb(fsb, 6, np.uint64)
    assert (back == mat).all()
    # offset-aware: a sliced array must decode the right rows
    back2 = matrix_from_fsb(fsb.slice(1, 2), 6, np.uint64)
    assert (back2 == mat[1:3]).all()


def test_fsb_matrix_float64():
    mat = np.random.RandomState(0).standard_normal((3, 5))
    back = matrix_from_fsb(fsb_from_matrix(mat), 5, np.float64)
    assert np.allclose(back, mat)


def test_list_matrix_infers_dim_and_handles_slices():
    col = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    m = list_matrix(col)
    assert m.shape == (3, 2) and m[2, 1] == 6.0
    m2 = list_matrix(col.slice(1, 2), dim=2)
    assert (m2 == np.array([[3.0, 4.0], [5.0, 6.0]])).all()
    assert list_matrix(pa.array([], type=pa.list_(pa.float64()))).shape[0] == 0


def test_half_away_rejects_nan():
    """ADVICE r2: NaN (null float upstream) must fail loudly, not cast to a
    platform-dependent garbage int64."""
    import numpy as np
    import pytest

    from virtuoso_quad_log_ray.numerics import half_away_int64

    with pytest.raises(ValueError, match="NaN"):
        half_away_int64(np.array([1.0, float("nan")]))


def test_hash_fingerprint_stable_and_impl_tagged():
    from virtuoso_quad_log_ray.numerics import hash_fingerprint

    fp = hash_fingerprint()
    assert fp == hash_fingerprint()  # deterministic within a process
    impl, _, digest = fp.partition(":")
    assert impl.startswith(("polars-", "md5-"))
    assert len(digest) == 32 and int(digest, 16) >= 0


def test_hash128_fsb_packs_both_words():
    import hashlib

    import pyarrow as pa

    from virtuoso_quad_log_ray.numerics import fsb_hex, hash128, hash128_fsb

    a = pa.array(["alpha", "beta", "alpha", ""])
    f = hash128_fsb(a)
    assert f.type == pa.binary(16) and len(f) == 4
    hx = fsb_hex(f).to_pylist()
    assert hx[0] == hx[2] and hx[0] != hx[1]
    assert all(len(h) == 32 and int(h, 16) >= 0 for h in hx)
    # hex rendering round-trips the packed bytes exactly
    assert [h for h in hx] == [f[i].as_py().hex() for i in range(4)]
    # deterministic with hash128 (same two words, little-endian packed)
    h1, h2 = hash128(a)
    import numpy as np

    packed = np.column_stack([h1.view(np.uint64), h2.view(np.uint64)]).astype("<u8")
    assert packed.tobytes() == b"".join(f[i].as_py() for i in range(4))


def test_fsb_hex_handles_sliced_arrays():
    """fsb_hex reads the raw data buffer; a sliced array's offset must be
    honored or every hex string shifts by the slice amount."""
    import pyarrow as pa

    from virtuoso_quad_log_ray.numerics import fsb_hex, hash128_fsb

    f = hash128_fsb(pa.array([f"v{i}" for i in range(10)]))
    whole = fsb_hex(f).to_pylist()
    sliced = fsb_hex(f.slice(3, 4)).to_pylist()
    assert sliced == whole[3:7]


def test_md5_digests_render_identically_through_fsb_hex():
    """The oracle path renders md5 digests via fsb_hex too — must equal
    hashlib's own hexdigest."""
    import hashlib

    import pyarrow as pa

    from virtuoso_quad_log_ray.numerics import fsb_hex

    texts = ["a", "bb", "ccc"]
    fsb = pa.array([hashlib.md5(t.encode()).digest() for t in texts], type=pa.binary(16))
    assert fsb_hex(fsb).to_pylist() == [hashlib.md5(t.encode()).hexdigest() for t in texts]


def test_fsb_hex_rejects_nulls():
    """Null slots hold undefined data-buffer bytes; rendering them would
    fabricate a shared fingerprint — fail loudly instead (the
    half_away_int64 convention)."""
    import pyarrow as pa
    import pytest

    from virtuoso_quad_log_ray.numerics import fsb_hex

    arr = pa.array([b"\x01" * 16, None], type=pa.binary(16))
    with pytest.raises(ValueError, match="null"):
        fsb_hex(arr)


def test_sql_mulmod64_matches_numpy_wraparound():
    """The shared 32-bit-split fragment must equal uint64 wraparound
    multiplication for constants above 2^32 (where a naive HUGEINT product
    would overflow INT128) — the contract all five hash oracles lean on."""
    from virtuoso_quad_log_ray.numerics import sql_mulmod64

    con = duckdb.connect()
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1 << 62, size=50, dtype=np.int64).astype(np.uint64)
    vals[:2] = [0, (1 << 64) - 1]
    for c in (0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 1099511628211, 1, (1 << 64) - 1):
        expect = (vals * np.uint64(c)).tolist()  # numpy wraps mod 2^64
        got = [
            r[0]
            for r in con.sql(
                f"SELECT CAST({sql_mulmod64('v', c)} AS UBIGINT) "
                "FROM (SELECT unnest(?) AS v)",
                params=[[int(v) for v in vals]],
            ).fetchall()
        ]
        assert got == expect, c


def test_sql_md5_le64_matches_md5_u64():
    """Byte-reversed-hex SQL fragment == np.frombuffer(digest[:8], '<u8'),
    for both digest halves."""
    import hashlib

    from virtuoso_quad_log_ray.numerics import md5_u64, sql_hex_le64, sql_md5_le64

    texts = ["", "a", "hello world", "x" * 100, "unicode-free ascii 123"]
    want_lo = md5_u64(pa.array(texts)).tolist()
    want_hi = [
        int(np.frombuffer(hashlib.md5(t.encode()).digest()[8:], dtype=np.uint64)[0])
        for t in texts
    ]
    con = duckdb.connect()
    got_lo = [
        r[0]
        for r in con.sql(
            f"SELECT {sql_md5_le64('t')} FROM (SELECT unnest(?) AS t)", params=[texts]
        ).fetchall()
    ]
    got_hi = [
        r[0]
        for r in con.sql(
            f"SELECT {sql_hex_le64('md5(t)', 17)} FROM (SELECT unnest(?) AS t)",
            params=[texts],
        ).fetchall()
    ]
    assert got_lo == want_lo and got_hi == want_hi

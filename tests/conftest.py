import duckdb
import pytest
import ray
import ray.data

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the testdata tables registered as views
    (mirrors the driver's correctness harness)."""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def to_arrow(result):
    """Normalize a Dataset / DataFrame / Table to a pyarrow Table."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tables = [ray.get(r) for r in result.to_arrow_refs()]
        # aggregate stages can emit empty blocks with an empty schema;
        # driver-side conversions (to_pandas/take_all) skip them, we do too
        tables = [t for t in tables if t.num_columns > 0]
        if not tables:  # fully empty dataset: recover the schema if any
            sch = result.schema(fetch_if_missing=False)
            base = getattr(sch, "base_schema", None) if sch is not None else None
            return base.empty_table() if base is not None else pa.table({})
        return pa.concat_tables(tables).combine_chunks()
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    return result


def assert_matches_oracle(ray_result, con, sql, sort_cols):
    """Row-for-row equality against the DuckDB oracle (column-name aligned,
    order-insensitive) — the driver's comparison, strengthened."""
    a_t = to_arrow(ray_result)
    b_t = con.sql(sql).arrow()
    assert sorted(a_t.column_names) == sorted(b_t.column_names), (
        a_t.column_names,
        b_t.column_names,
    )
    a = a_t.to_pandas().sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    b = b_t.to_pandas().sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    for c in sorted(a_t.column_names):
        av, bv = a[c].astype(str).values, b[c].astype(str).values
        bad = av != bv
        assert not bad.any(), f"col {c}: {av[bad][:3]} != {bv[bad][:3]}"

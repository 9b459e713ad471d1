"""Property test: the SQL mirror of the cell index agrees with numpy for
arbitrary coordinates and levels (hypothesis-driven, DuckDB-evaluated)."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geotiff_scalable_analysis_pipeline_spark.functions import cells

con = duckdb.connect()


@given(
    x=st.floats(min_value=0, max_value=131071.9, allow_nan=False),
    y=st.floats(min_value=0, max_value=131071.9, allow_nan=False),
    level=st.integers(1, 12),
)
@settings(max_examples=200, deadline=None)
def test_cell_id_sql_mirror(x, y, level):
    want = int(cells.cell_id_np(np.array([x]), np.array([y]), level)[0])
    got = con.execute(f"SELECT {cells.cell_id_sql(repr(x), repr(y), level)}").fetchone()[0]
    assert got == want


@given(
    ix=st.integers(0, 4095), iy=st.integers(0, 4095), level=st.just(12)
)
@settings(max_examples=100, deadline=None)
def test_morton_sql_mirror(ix, iy, level):
    want = int(cells.morton_np(np.array([ix]), np.array([iy]))[0])
    got = con.execute(f"SELECT {cells.morton_sql(str(ix), str(iy), level)}").fetchone()[0]
    assert got == want

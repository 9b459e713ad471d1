"""Closed-form memory model (reference memory_utils.py:10-125 analog)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from geotiff_scalable_analysis_pipeline_spark.plans import memory_model as mm


def test_zor_monotone_in_budget():
    small = mm.optimal_zor(4, 8, 32, 16, halo=16, budget_bytes=64 << 20)
    big = mm.optimal_zor(4, 8, 32, 16, halo=16, budget_bytes=1 << 30)
    assert small <= big
    assert small % 32 == 0 and big % 32 == 0


def test_zor_floor_is_one_patch():
    assert mm.optimal_zor(12, 19, 120, 60, halo=128, budget_bytes=1 << 20) == 120


def test_zor_padded_chunk_fits_budget():
    # the solved ZoR's padded footprint must actually fit
    for budget in (128 << 20, 512 << 20, 4 << 30):
        zor = mm.optimal_zor(12, 19, 120, 60, halo=128, budget_bytes=budget, segmentation=True)
        side = zor + 2 * 128
        bpp = mm.chunk_bytes_per_pixel(12, 19, 120, 60, segmentation=True)
        if zor > 120:  # above the floor the bound is honored
            assert side * side * bpp <= budget


@given(
    bands=st.integers(1, 16),
    classes=st.integers(2, 32),
    halo=st.integers(0, 64),
    budget=st.integers(1 << 20, 8 << 30),
)
@settings(max_examples=50, deadline=None)
def test_zor_always_valid(bands, classes, halo, budget):
    zor = mm.optimal_zor(bands, classes, 32, 16, halo=halo, budget_bytes=budget)
    assert zor >= 32 and zor % 32 == 0


def test_arrow_rows_fat_vs_narrow():
    # 128 KiB media payloads: a 512 MB budget admits ~hundreds of rows
    fat = mm.arrow_rows_for_payload(128 * 1024, budget_bytes=512 << 20)
    assert 1 <= fat < 8192
    # narrow rows cap at the engine's large-batch default
    assert mm.arrow_rows_for_payload(64, budget_bytes=512 << 20) == 8192
    # an enormous blob still gets at least one row
    assert mm.arrow_rows_for_payload(16 << 30, budget_bytes=512 << 20) == 1


def test_autotune_conf_keys_and_bounds():
    conf = mm.autotune_conf(128 * 1024, budget_bytes=512 << 20)
    rows = int(conf["spark.sql.execution.arrow.maxRecordsPerBatch"])
    part = int(conf["spark.sql.files.maxPartitionBytes"])
    assert rows * 128 * 1024 * 3 <= 512 << 20
    assert 4 << 20 <= part <= 128 << 20


def test_autotune_fat_payload_small_batches():
    """A genuinely fat blob column (8 MB payloads — e.g. a full-res band
    window) must drop to small Arrow batches: rows × payload × copies stays
    inside the per-task budget, far below the 8192-row narrow default."""
    conf = mm.autotune_conf(8 * 1024 * 1024)
    rows = int(conf["spark.sql.execution.arrow.maxRecordsPerBatch"])
    assert 1 <= rows <= 64
    part = int(conf["spark.sql.files.maxPartitionBytes"])
    assert part >= 8 * 1024 * 1024  # at least one payload per scan split

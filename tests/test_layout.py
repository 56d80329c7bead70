"""Z-order layout: per-file footer stats must tighten on EVERY
participating dimension (single-column sort tightens only its own),
measured directly from the parquet footers via pyarrow.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from proglog_spark.sources.layout import write_zordered, zorder_key


def _file_ranges(path, col):
    """Per-file (min, max) of col from parquet footer statistics."""
    out = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        out.append((min(mins), max(maxs)))
    return out


def _avg_span(ranges, domain):
    return sum(hi - lo for lo, hi in ranges) / (len(ranges) * domain)


def test_zorder_key_interleaves_bits(spark):
    df = spark.range(1).select(
        zorder_key([F.lit(0b101), F.lit(0b011)], bits=3).alias("z")
    )
    # x=101, y=011 -> interleave LSB-first (x bit i at 2i, y at 2i+1):
    # bit0 x=1, y=1 -> 11; bit1 x=0, y=1 -> 10; bit2 x=1, y=0 -> 01
    assert df.collect()[0].z == 0b011011


def test_zorder_rejects_overflow(spark):
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(["a", "b"], bits=32)


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    # 64x64 uniform grid: every (u, t) pair once
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("u"),
        (F.col("id") / 64).cast("long").alias("t"),
    )
    z_path, s_path = str(tmp_path / "zord"), str(tmp_path / "tsort")
    write_zordered(grid, z_path, ["u", "t"], bits=6, num_files=16)
    grid.repartitionByRange(16, "t").sortWithinPartitions(
        "t"
    ).write.parquet(s_path)

    z_u, z_t = _file_ranges(z_path, "u"), _file_ranges(z_path, "t")
    s_u, s_t = _file_ranges(s_path, "u"), _file_ranges(s_path, "t")

    # single-column sort: t tight, u full-width (prunes nothing on u)
    assert _avg_span(s_t, 64) < 0.15
    assert _avg_span(s_u, 64) > 0.9
    # z-order: BOTH dimensions tight — 16 files over a 64x64 grid is
    # ideally 16x16 tiles (span 0.25 each); allow slack for range-
    # partition sampling placing file cuts mid-tile
    assert _avg_span(z_u, 64) < 0.5
    assert _avg_span(z_t, 64) < 0.5

    # layout is invisible to readers except through pruning
    back = spark.read.parquet(z_path)
    assert back.count() == 64 * 64
    assert set(back.columns) == {"u", "t"}

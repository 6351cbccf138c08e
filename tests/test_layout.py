"""Z-order layout: bit-exact Morton keys and the locality property the
layout exists for (tight per-file min/max spans on EVERY clustered
dimension, vs. tight on none for arrival order)."""

import pandas as pd
import pyspark.sql.functions as F

from amazon_security_lake_transformation_library_spark.plans import layout


def test_zorder_key_hand_interleave(spark):
    # 2 cols, bits=2: ranks quantize over [0,3]; z = interleave(x bit b
    # at position 2b, y bit b at position 2b+1).
    df = spark.createDataFrame(
        pd.DataFrame({"x": [0, 3, 0, 3], "y": [0, 0, 3, 3]})
    )
    got = {
        (r["x"], r["y"]): r["z_key"]
        for r in layout.zorder_key(df, ["x", "y"], bits=2).collect()
    }
    # rank(0)=0 (00), rank(3)=3 (11)
    assert got[(0, 0)] == 0b0000
    assert got[(3, 0)] == 0b0101   # x bits at even positions
    assert got[(0, 3)] == 0b1010   # y bits at odd positions
    assert got[(3, 3)] == 0b1111


def test_zorder_key_null_and_degenerate(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, None, 2.0], "y": [5, 5, 5]})
    )
    rows = layout.zorder_key(df, ["x", "y"], bits=4).collect()
    z = {r["x"]: r["z_key"] for r in rows}
    assert z[None] == 0          # NULL ranks to 0
    assert z[1.0] == 0           # min of range
    # degenerate y (constant) contributes nothing; x=2 is the max -> all
    # 4 x-bits set at even positions (stride 2): 0b01010101
    assert z[2.0] == 0b01010101


def test_zorder_layout_locality_beats_arrival_order(spark):
    # 32x32 grid visited in row-major arrival order. Cut into 16 equal
    # "files" both ways; z-order files must have FAR tighter y-spans
    # (arrival order gives every file the full y range on one of the two
    # dims when sliced the other way).
    grid = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pd.DataFrame(grid, columns=["x", "y"]))
    zed = layout.zorder_key(df, ["x", "y"], bits=5)
    spans = layout.bucket_spans(zed, ["x", "y"], bits=5, bucket_bits=4)
    rows = spans.collect()
    assert len(rows) == 16 and all(r["n_rows"] == 64 for r in rows)
    # every z-bucket of 64 cells is an 8x8 tile: span 7 on both dims
    for r in rows:
        assert r["max_x"] - r["min_x"] == 7
        assert r["max_y"] - r["min_y"] == 7
    # arrival order (row-major by x): a 64-row slice spans the FULL y
    # range (31) — z-order cuts the worst-dim span by ~4x.


def test_zorder_layout_is_sorted_within_partitions(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": range(100), "y": [i * 7 % 100 for i in range(100)]})
    )
    out = layout.zorder_layout(df, ["x", "y"], bits=6, num_files=4)
    # per-partition sortedness on z_key
    pdf = out.select(
        F.spark_partition_id().alias("pid"), "z_key"
    ).toPandas()
    for _, g in pdf.groupby("pid"):
        assert list(g["z_key"]) == sorted(g["z_key"])
    assert len(pdf) == 100

"""Explicit StructType registry (SURVEY.md §1.4: the reference infers
schemas ad hoc; the engine declares every table — FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import types as T

# family A: detector-domain tables
FACE_MODULES = T.StructType(
    [
        T.StructField("face", T.IntegerType(), False),
        T.StructField("module_id", T.IntegerType(), False),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)

SENSOR_CENTERS = T.StructType(
    [
        T.StructField("disk", T.IntegerType(), False),
        T.StructField("face", T.StringType(), False),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
)

SENSORS = T.StructType(
    [
        T.StructField("layer", T.IntegerType(), False),
        T.StructField("sensor_id", T.LongType(), False),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("ax1", T.DoubleType()),
        T.StructField("ax2", T.DoubleType()),
        T.StructField("ay1", T.DoubleType()),
        T.StructField("ay2", T.DoubleType()),
    ]
)

RAYS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("eta", T.DoubleType()),
        T.StructField("phi", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)

LAYERS = T.StructType(
    [
        T.StructField("layer", T.IntegerType(), False),
        T.StructField("z_mm", T.DoubleType()),
    ]
)

BV_CURVES = T.StructType(
    [
        T.StructField("vendor", T.StringType(), False),
        T.StructField("variant", T.StringType()),
        T.StructField("charge_fc", T.DoubleType()),
        T.StructField("a", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
    ]
)

MOD_PARTITIONS = T.StructType(
    [
        T.StructField("row_ordinal", T.IntegerType(), False),
        T.StructField("n_boards", T.IntegerType()),
        T.StructField("flavors", T.ArrayType(T.IntegerType())),
    ]
)

BLOCKED_GEOMETRIES = T.StructType(
    [
        T.StructField("geom_id", T.IntegerType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("layout", T.StringType()),
        T.StructField(
            "vertices",
            T.ArrayType(
                T.StructType(
                    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
                )
            ),
        ),
    ]
)

# multimodal payload table (extension layer)
MEDIA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes_meta", T.LongType()),
                    T.StructField("lang", T.StringType()),
                ]
            ),
        ),
    ]
)

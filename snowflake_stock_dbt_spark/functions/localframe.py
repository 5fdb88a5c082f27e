"""Driver-local constant DataFrames via Arrow (optimization round 11).

``spark.createDataFrame(list, ddl)`` routes a driver-local constant
through ``sc.parallelize``: the rows are PICKLED into
``defaultParallelism`` slices and every slice's task launches a Python
worker just to deserialize them back — pure Python-boundary waste
(optimization guide §4) for data that never needed to leave the driver.
Measured on the bench host (32 cores, 2000-row codebook of 64-long
arrays): 0.84 s per call site on the pickled path vs 0.08 s via a
pyarrow Table, and the event log shows each pickled site burning ~10
executor-seconds of blocked (zero-CPU) task time. On a real cluster the
same pattern wastes a Python worker spin-up per core per call.

``local_frame`` builds the same DataFrame from a ``pyarrow.Table``
(Spark 4 converts Arrow batches JVM-side: no Python workers, one
partition, no pickle) and falls back to the classic path if anything
about the data or environment refuses Arrow.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession


def local_frame(
    spark: SparkSession, data: Sequence[tuple], schema: Any
) -> DataFrame:
    """``spark.createDataFrame(data, schema)`` for small driver-local
    constants, via the Arrow fast path when possible. ``schema`` is a
    DDL string or a StructType."""
    try:
        return _arrow_frame(spark, data, schema)
    except Exception:
        return spark.createDataFrame(data, schema)


def _arrow_frame(
    spark: SparkSession, data: Sequence[tuple], schema: Any
) -> DataFrame:
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType, _parse_datatype_string

    st = (
        schema
        if isinstance(schema, StructType)
        else _parse_datatype_string(schema)
    )
    if not isinstance(st, StructType):
        raise TypeError(f"expected struct DDL, got {st}")
    names = st.fieldNames()
    # Malformed rows must RAISE (falling back to createDataFrame's strict
    # length/type errors), not be silently null-filled or mis-zipped by
    # from_pylist: a dict row's keys would zip as values, and a short row
    # would null-pad (ADVICE r11).
    for r in data:
        if isinstance(r, dict) or not isinstance(r, Sequence) or isinstance(
            r, (str, bytes)
        ):
            raise TypeError(f"expected a sequence row, got {type(r).__name__}")
        if len(r) != len(names):
            raise ValueError(
                f"row has {len(r)} values for {len(names)} fields"
            )
    rows = [
        {n: _pyvalue(v, f.dataType) for n, v, f in zip(names, r, st.fields)}
        for r in data
    ]
    tbl = pa.Table.from_pylist(rows, schema=to_arrow_schema(st))
    return spark.createDataFrame(tbl)


def _pyvalue(v: Any, dtype: Any) -> Any:
    """Recursively shape a Python value for pyarrow: struct values may
    arrive as tuples (the createDataFrame convention) but ``from_pylist``
    needs dicts; arrays recurse into their elements."""
    from pyspark.sql.types import ArrayType, StructType

    if v is None:
        return None
    if isinstance(dtype, StructType):
        if not isinstance(v, dict):
            v = dict(zip(dtype.fieldNames(), v))
        return {
            f.name: _pyvalue(v.get(f.name), f.dataType) for f in dtype.fields
        }
    if isinstance(dtype, ArrayType):
        return [_pyvalue(x, dtype.elementType) for x in v]
    return v

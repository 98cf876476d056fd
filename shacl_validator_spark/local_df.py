"""Arrow-backed construction of small driver-side DataFrames.

``spark.createDataFrame(list_of_rows, schema)`` builds a pickled Python
RDD (``LogicalRDD``): every action that touches it — including each AQE
broadcast-build job — spawns Python workers to unpickle the rows.  In the
validator a 35-constraint suite references its facet table from ~12 plan
branches, and each reference cost a 32-task Python-worker job with ~0.1 s
of CPU and ~7 s of blocked runtime (measured, r4 profile).

Going through a ``pyarrow.Table`` instead yields a true Catalyst
``LocalRelation``: rows live in the JVM plan, broadcast builds are
driver-local, no Python worker is ever involved, and Catalyst can prune /
fold into it.  Falls back to the classic path for types Arrow cannot
carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_df(spark: SparkSession, rows: list, schema: T.StructType | str) -> DataFrame:
    """A small driver-side relation as a JVM LocalRelation when possible.

    ``rows`` may be dicts (keyed by field name) or tuples in field order;
    ``schema`` a StructType or DDL string.  Semantics match
    ``spark.createDataFrame(rows, schema)``.
    """
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(schema)
        names = schema.fieldNames()
        if rows and not isinstance(rows[0], dict):
            rows = [dict(zip(names, r)) for r in rows]
        tbl = pa.Table.from_pylist(rows, schema=arrow_schema)
        return spark.createDataFrame(tbl)
    except Exception:
        # Arrow cannot represent the schema/values (or the conversion
        # changed semantics) — the pickled-RDD path is slower but always
        # correct
        return spark.createDataFrame(rows, schema)

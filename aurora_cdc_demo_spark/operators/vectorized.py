"""Scalar Arrow pandas_udf helpers.

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves the pd.Series type hints at decoration time, and
postponed-evaluation string annotations defeat that resolution (the
registry module uses the future import, so the UDFs live here).
"""

import hashlib

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def md5_vectorized(s: pd.Series) -> pd.Series:
    """Arrow-batched md5 hex digest — pinned bit-identical to the
    JVM ``F.md5`` and the DuckDB ``md5`` in tests/oracles."""
    return s.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())

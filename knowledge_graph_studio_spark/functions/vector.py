"""Vector column expressions — JVM-side (whole-stage codegen), no UDFs.

Used by the query layer's brute-force top-k (Q8/Q9 analogs) and by the
similarity operators. The fold stays inside Catalyst (``aggregate`` +
``zip_with``), so scoring N vectors is one codegen'd projection — at 100 TB
the scan dominates, not Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                    lambda acc, x: acc + x)
    )


def cosine_col(a, b) -> Column:
    """Exact cosine over two array<float|double> columns (cast to double)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot_col(ad, bd) / (norm_col(ad) * norm_col(bd))

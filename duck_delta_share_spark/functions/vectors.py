"""Vector math over `array<float>` embedding columns — pure Catalyst
expressions (zip_with / aggregate / higher-order functions), no UDFs, so
dot products run inside codegen on every executor.

Two precision modes:

- ``dot_exact`` — products cast to DECIMAL and summed with exact decimal
  arithmetic: associative, so the result is bit-identical across any
  partitioning AND matches the DuckDB oracle exactly. Used by the
  oracle-gated queries.
- ``dot_fast`` — plain double accumulation (left-to-right within the array,
  which is deterministic for a per-row fold). ~2x faster; used by the
  ANN/scale paths where last-ulp reproducibility vs another engine is not
  required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Addend/accumulator precision: |x*y| < 1 for unit-scale embeddings; scale 12
# keeps double→decimal rounding tie-free and sums of 64 terms exact.
_PROD_DEC = "decimal(30,12)"


def _to_double_product(x: Column, y: Column) -> Column:
    # float*float in Spark stays single-precision; promote BEFORE multiplying
    # so the product matches engines (DuckDB) that compute in double.
    return x.cast("double") * y.cast("double")


def dot_exact(a: Column | str, b: Column | str) -> Column:
    """Order-independent exact dot product emitted as double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: _to_double_product(x, y).cast(_PROD_DEC))
    return F.aggregate(
        products,
        F.lit(0).cast(_PROD_DEC),
        lambda acc, v: (acc + v).cast(_PROD_DEC),
    ).cast("double")


def norm_exact(a: Column | str) -> Column:
    """L2 norm via exact self-dot; sqrt is correctly-rounded IEEE → identical
    across engines."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot_exact(a, a))


def cosine_exact(a: Column | str, b: Column | str, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed exact dot and norms (single IEEE division)."""
    return dot_exact(a, b) / (norm_a * norm_b)


def dot_fast(a: Column | str, b: Column | str) -> Column:
    """Double-accumulation dot product: deterministic per row (sequential
    fold over the array), fastest expression-only form."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _to_double_product(x, y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_fast(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot_fast(a, a))

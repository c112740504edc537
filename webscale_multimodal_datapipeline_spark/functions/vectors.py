"""Vector (embedding) column expressions.

The reference produces L2-normalized CLIP/SigLIP embeddings as
``list<float32>`` columns (``image_clip_embedding.py:171-179``,
``image_siglip_embedding.py:212-220``) and scores them with small MLP heads
(``image_aesthetic_quality.py:45-69``, ``image_aigc_detector.py:48-69``).

Here vectors stay native ``array<float>`` columns and the math is expressed
with ``F.zip_with`` / ``F.aggregate`` — JVM-side, codegen'd, no Python.
All math is done in double precision (cast first) so the DuckDB oracle
(which computes in double) matches bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product via zip_with + aggregate (sequential left-to-right sum,
    matching DuckDB's list accumulation order)."""
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(col: Column | str) -> Column:
    return F.sqrt(dot(col, col))


def is_valid_vector(col: Column | str) -> Column:
    """TRUE iff the embedding has content: non-NULL array with no NULL
    elements. Contentless vectors are excluded from ML ingestion by spec —
    a NULL array NPEs ``array_to_vector``, a NULL element violates the
    non-nullable Seq[Double] contract, and a driver-side training sample
    containing None breaks numpy. SQL mirror:
    ``col IS NOT NULL AND len(list_filter(col, x -> x IS NULL)) = 0``."""
    c = _c(col)
    return c.isNotNull() & ~F.exists(c, lambda x: x.isNull())


def guarded_div(num: Column, den: Column) -> Column:
    """NULL instead of a divide-by-zero (ANSI mode raises): cosine and its
    relatives are UNDEFINED on zero-norm vectors — and zero vectors are
    in-domain (the CLIP zero-vector contract emits them). A NULL den also
    yields NULL (the ``when`` condition is NULL). Mirrored by
    ``oracle_fragments.sql_guarded_div``."""
    return F.when(den != 0, num / den)


def cosine(a: Column | str, b: Column | str) -> Column:
    return guarded_div(dot(a, b), l2_norm(a) * l2_norm(b))


def div_elements(arr: Column, den: Column) -> Column:
    """``arr[i] / den`` with ``den`` evaluated ONCE per row (r10, guide
    §4.1/§7.2): referencing a derived scalar inside a ``transform`` lambda
    re-evaluates its CollapseProject-inlined definition PER ELEMENT —
    higher-order functions are interpreted, so an aggregate-built scalar
    like an L2 norm costs O(dim) per element, O(dim²) per row (measured
    17x on the 64-dim embedding fixture: 1.05 s → 0.06 s for the
    normalized-projection pass at sf0.1). ``zip_with`` against
    ``array_repeat(den, size(arr))`` evaluates ``den`` once per row and
    performs the IDENTICAL per-element double division, so results are
    bit-identical."""
    return F.zip_with(
        arr, F.array_repeat(den, F.size(arr)), lambda x, d: x / d
    )


def l2_normalize(col: Column | str) -> Column:
    """L2-normalize (zero vector stays zero — reference zero-vector default,
    ``image_clip_embedding.py:150-158``)."""
    n = l2_norm(col)
    return F.when(
        n > 0, div_elements(to_double_array(col), n)
    ).otherwise(to_double_array(col))


def mlp_score(col: Column | str, weights: list[float], bias: float) -> Column:
    """Single linear layer over an embedding column (the shape of the
    reference's aesthetic/AIGC heads applied to precomputed embeddings,
    ``image_aesthetic_quality.py:195-233``). Deterministic weights make it
    oracle-checkable; real checkpoints would ride a pandas UDF instead.
    """
    arr = to_double_array(col)
    w = F.array(*[F.lit(float(x)) for x in weights])
    prods = F.zip_with(arr, w, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(float(bias)), lambda acc, x: acc + x)

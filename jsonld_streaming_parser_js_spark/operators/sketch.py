"""Approximate aggregates: deterministic HyperLogLog distinct-count.

Spark's built-in ``approx_count_distinct`` (HLL++) and DuckDB's
``approx_count_distinct`` use different hash functions and bias tables,
so their estimates can never be value-compared. This implementation
derives the sketch ENTIRELY from md5 — available and bit-identical in
both engines — so even the *approximate* operator gets an exact value
oracle (the repo's no-recall-hand-waving rule, cf. the LSH lanes).

Construction (classic Flajolet et al. HLL, m = 2^b registers):
- register index ``j`` = first ``b`` bits of md5(key) (hex prefix -> int)
- ``w``   = next 32 bits
- ``rho`` = position of the leftmost 1-bit of w = 33 - bitlength(w),
  where bitlength is ``length(bin(w))`` — a STRING op, deliberately, so
  both engines agree exactly (floor(log2) differs across libm builds in
  the last ulp near powers of two)
- registers: ``max(rho)`` per j — an algebraic aggregate: map-side
  partial max, one tiny shuffle of <= m rows per partition, mergeable
  across any partitioning (the property that makes sketches THE
  100 TB-scale distinct-count tool: unlike count(distinct), no
  re-shuffle of the key universe).
- estimate: alpha_m * m^2 / sum(2^-M_j) with the standard small-range
  linear-counting correction (E <= 2.5m and empty registers present).
  The 2^-M_j sum is EXACT in binary64 for m <= 2^8 and M <= 33
  (dyadic terms, 41 mantissa bits needed < 53), so the only
  cross-engine float risk is ln() in the correction — covered by
  rounding the reported estimate to 4 decimals.

Expected relative error ~= 1.04/sqrt(m) (~6.5% at m=256).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, col: str, b: int = 8) -> DataFrame:
    """One-row DataFrame: (n_exact, hll_estimate, m, rel_error).

    ``n_exact`` (an exact aggregation over the same input) is included
    deliberately: the lane is an ACCURACY AUDIT of the sketch, mirroring
    the recall-audit pattern of the ANN lanes. Production callers use
    the sketch alone.

    r8 plan shape (guide §2.4): ONE lineage. The old form computed
    ``n_exact`` as a separate ``countDistinct`` branch cross-joined onto
    the sketch branch — on a computed input that re-ran the whole
    upstream pipeline (parse -> quads) a second time. Now the keys are
    deduplicated once (``max(rho)`` per register is invariant under key
    duplication, and the per-register distinct-key counts sum to
    ``n_exact``), and both the registers and the exact count come out of
    the same two uniform-key shuffles. Values are bit-identical: same
    registers, same estimate arithmetic, same exact count.
    """
    if not 4 <= b <= 12:
        raise ValueError(f"b={b}: register-count exponent must be 4..12")
    m = 1 << b
    hexd = b // 4 + (1 if b % 4 else 0)  # hex digits covering b bits
    keys = df.select(F.col(col).alias("k")).where(F.col("k").isNotNull())
    j = F.pmod(F.conv(F.substring(F.md5("k"), 1, hexd), 16, 10)
               .cast("long"), F.lit(m))
    w = F.conv(F.substring(F.md5("k"), hexd + 1, 8), 16, 10).cast("long")
    rho = (F.when(w == 0, F.lit(33))
           .otherwise(F.lit(33) - F.length(F.bin(w))))
    # distinct keys once (uniform md5-ish key shuffle), then per-register
    # max(rho) AND distinct-key count from the same aggregation
    regs = (keys.distinct()
            .select(j.alias("j"), rho.alias("rho"))
            .groupBy("j").agg(F.max("rho").alias("M"),
                              F.count("*").alias("n_keys")))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("s_present"),
        F.count("*").alias("n_present"),
        F.sum("n_keys").alias("n_exact"))
    est = agg.select(
        "n_exact",
        (F.lit(alpha * m * m)
         / (F.col("s_present") + (F.lit(m) - F.col("n_present"))))
        .alias("e_raw"),
        (F.lit(m) - F.col("n_present")).alias("v_zero"))
    corrected = est.select(
        "n_exact",
        F.when((F.col("e_raw") <= 2.5 * m) & (F.col("v_zero") > 0),
               F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")))
        .otherwise(F.col("e_raw")).alias("estimate"))
    return (corrected
            .select("n_exact",
                    F.round("estimate", 4).alias("hll_estimate"),
                    F.lit(m).alias("m"),
                    F.round(F.abs(F.col("estimate") - F.col("n_exact"))
                            / F.col("n_exact"), 4).alias("rel_error")))


def hll_distinct_sql(source_sql: str, key: str, b: int = 8) -> str:
    """DuckDB twin of :func:`hll_distinct` over ``source_sql`` (a query
    producing a ``{key}`` column); byte-for-byte the same md5-derived
    sketch, so the oracle checks the estimate EXACTLY."""
    m = 1 << b
    hexd = b // 4 + (1 if b % 4 else 0)
    # 'e0' suffix: bare decimal literals are DECIMAL in DuckDB (which
    # overflows on *m*m and rounds differently); the exponent forces
    # binary64, matching Spark's float math exactly
    alpha = repr(0.7213 / (1.0 + 1.079 / m)) + "e0"
    return f"""
WITH src AS ({source_sql}),
keys AS (SELECT {key} AS k FROM src WHERE {key} IS NOT NULL),
hashed AS (
  SELECT ('0x' || substr(md5(k), 1, {hexd}))::BIGINT % {m} AS j,
         ('0x' || substr(md5(k), {hexd + 1}, 8))::BIGINT AS w
  FROM keys
),
regs AS (
  SELECT j, MAX(CASE WHEN w = 0 THEN 33
                     ELSE 33 - length(bin(w)) END) AS M
  FROM hashed GROUP BY j
),
agg AS (
  SELECT sum(power(2.0, -M)) AS s_present, count(*) AS n_present
  FROM regs
),
est AS (
  SELECT {alpha} * {m}e0 * {m}e0
           / (s_present + ({m} - n_present)) AS e_raw,
         {m} - n_present AS v_zero
  FROM agg
),
corrected AS (
  SELECT CASE WHEN e_raw <= 2.5e0 * {m}e0 AND v_zero > 0
              THEN {m}e0 * ln({m}e0 / v_zero)
              ELSE e_raw END AS estimate
  FROM est
)
SELECT (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM keys) AS n_exact,
       round(estimate, 4) AS hll_estimate,
       {m} AS m,
       round(abs(estimate - (SELECT count(DISTINCT k) FROM keys))
             / (SELECT count(DISTINCT k) FROM keys), 4) AS rel_error
FROM corrected"""

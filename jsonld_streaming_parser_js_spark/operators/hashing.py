"""Shared deterministic hashing helpers.

Parity-critical expressions used by MULTIPLE operators and replayed
bit-for-bit by DuckDB oracles live here, in exactly one place — any
drift between an operator and its oracle twin breaks value-hash
verification, so the expression must not be copy-pasted per module.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def md5_stratum(col: F.Column, mod: int) -> F.Column:
    """First 8 hex digits of ``md5(CAST(col AS STRING))`` as an int,
    mod ``mod`` — THE deterministic stratum hash (recall-audit sampler,
    stratified sampling). md5, not xxhash64, so DuckDB computes the
    identical stratum:
    ``('0x' || substr(md5(CAST(col AS VARCHAR)), 1, 8))::BIGINT % mod``.
    """
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(mod))

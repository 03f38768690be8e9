"""Privacy transforms: keyed pseudonymization and differential-privacy
noise — the release-side companions to the engine's detection/audit
ops (``operators/pii.py``, ``k_anonymity`` in plans, the
right-to-be-forgotten sink ``sinks/forget.py``).

**Pseudonymization** replaces a direct identifier with a keyed token
(md5 over a secret salt + the id). Same id -> same token (joins and
group-bys on the tokenized data still work); without the salt the
mapping is not recomputable. The **vault** — the (id, token) mapping
needed for authorized re-identification — is produced as a separate
DataFrame the caller stores under stricter controls, exactly the
split GDPR pseudonymization expects. Tokenization is one md5 per row
(narrow, codegen); the vault is a distinct-aggregate over ids.

**DP noise** here is the deterministic-Laplace trick: the uniform
draw comes from a keyed hash of the group key, not an RNG, so the
release is reproducible (and testable cross-engine) while still
having the Laplace(b) shape across keys. True epsilon-DP needs a
secret unpredictable draw — swap the hash salt for a secret key at
release time; the plan shape is identical. Inverse-CDF:
``noise = -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["pseudonymize", "laplace_noise"]

# md5-prefix window and scale shared with the engine's hashing family
# (bloom/count-min/sampling): 7 hex chars -> exact in a double
_HEX_DIGITS = 7
_SCALE = float(16**_HEX_DIGITS)


def pseudonymize(
    df: DataFrame, id_col: str, salt: str
) -> tuple[DataFrame, DataFrame]:
    """``(tokenized, vault)``: df with ``id_col`` replaced by
    ``<id_col>_token``, and the distinct (id, token) vault."""
    token = F.md5(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    tokenized = df.withColumn(f"{id_col}_token", token).drop(id_col)
    vault = (
        df.select(id_col)
        .distinct()
        .select(F.col(id_col), token.alias(f"{id_col}_token"))
    )
    return tokenized, vault


def laplace_noise(key: Column, salt: str, b: float) -> Column:
    """Deterministic Laplace(b) noise keyed on ``key`` (see module
    docstring). u is the md5-prefix uniform in [0, 1); the 1/2-offset
    form keeps u = 0 finite (ln(1 - 2*|0 - .5|) = ln(0) guarded by a
    half-ulp clamp)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string"))),
            1,
            _HEX_DIGITS,
        ),
        16,
        10,
    )
    u = h.cast("long").cast("double") / F.lit(_SCALE)
    centered = u - F.lit(0.5)
    mag = F.least(
        F.lit(1.0) - F.lit(2.0) * F.abs(centered), F.lit(1.0)
    )
    mag = F.greatest(mag, F.lit(1.0 / _SCALE))  # ln(0) guard
    sign = F.when(centered < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return -F.lit(b) * sign * F.log(mag)

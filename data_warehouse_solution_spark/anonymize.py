"""Column anonymization — the reference's ``encrypt_data``
(``pipeline.py:72-84``) re-expressed for a distributed engine.

The reference Fernet-encrypts chosen columns cell-by-cell with a key
generated fresh per run and never persisted (``pipeline.py:72``), so
its "encryption" is effectively one-way anonymization. We make key
handling explicit with three modes:

- ``sha256``  — deterministic keyed hash (``F.sha2``): JVM-side,
  codegen'd, join-preserving, value-hash-checkable. The default and
  the only mode that belongs in a 100 TB hot path.
- ``aes``     — Spark built-in ``aes_encrypt`` (random IV in GCM →
  non-deterministic output, real decryptable encryption with a
  caller-provided key).
- ``fernet``  — parity mode with the reference's exact token format,
  as an Arrow-batched pandas UDF (Python per batch, not per row).

All modes produce StringType regardless of input type, matching the
reference (``str(x).encode()`` → token string, ``pipeline.py:81``),
and warn-and-skip missing columns exactly like ``pipeline.py:82-83``.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

MODES = ("sha256", "aes", "fernet")


def _sha256_col(col: Column, salt: str) -> Column:
    return F.sha2(F.concat(F.lit(salt), col.cast("string")), 256)


def _aes_col(col: Column, key: bytes) -> Column:
    # aes_encrypt operates on binary; base64 keeps the result a string
    # column like every other mode. The key goes in as a BYTES literal
    # (F.lit(bytes) -> BinaryType) — round-tripping through str would
    # corrupt non-UTF-8 keys (os.urandom keys aren't decodable) and
    # re-encoding non-ASCII text changes the byte length, breaking the
    # 16/24/32-byte AES requirement.
    return F.base64(F.aes_encrypt(col.cast("string").cast("binary"), F.lit(key)))


def _fernet_udf(key: bytes):
    import pandas as pd  # local import: executors pickle this closure
    from cryptography.fernet import Fernet
    from pyspark.sql.functions import pandas_udf

    def fernet_encrypt(s):
        f = Fernet(key)  # one Fernet per Arrow batch, not per row
        return s.astype(str).map(lambda v: f.encrypt(v.encode()).decode())

    # real class objects, not strings: `from __future__ import
    # annotations` would otherwise leave hints pandas_udf can't parse
    fernet_encrypt.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(fernet_encrypt, "string")


def anonymize(
    df: DataFrame,
    sensitive_columns: list[str],
    mode: str = "sha256",
    *,
    key: str | bytes | None = None,
    salt: str = "",
) -> DataFrame:
    """Anonymize ``sensitive_columns`` of ``df`` in the given mode.

    Missing columns log a warning and are skipped (reference behavior,
    ``pipeline.py:82-83``); present columns become StringType.
    """
    if mode not in MODES:
        raise ValueError(f"unknown anonymize mode {mode!r}; expected one of {MODES}")
    if mode == "aes" and not key:
        raise ValueError("aes mode requires a key (16/24/32 bytes)")
    if mode == "fernet":
        from cryptography.fernet import Fernet

        key = key or Fernet.generate_key()
        udf = _fernet_udf(key if isinstance(key, bytes) else key.encode())

    out = df
    for name in sensitive_columns:
        if name not in df.columns:
            logger.warning("Column '%s' not found in DataFrame. Skipping encryption.", name)
            continue
        if mode == "sha256":
            out = out.withColumn(name, _sha256_col(F.col(name), salt))
        elif mode == "aes":
            # normalize to bytes; str keys are encoded once here (UTF-8)
            # and the byte length is what AES validates
            aes_key = key if isinstance(key, bytes) else str(key).encode()
            if len(aes_key) not in (16, 24, 32):
                raise ValueError(
                    f"aes key must be 16/24/32 bytes, got {len(aes_key)}"
                )
            out = out.withColumn(name, _aes_col(F.col(name), aes_key))
        else:
            out = out.withColumn(name, udf(F.col(name)))
    return out

"""Digest operators (reference §2.13, Digester.java).

- ``digest(alg)``: MessageDigest over the ordered concatenation of the
  UTF-8 pieces; absent pieces are *skipped* (a digest is still
  produced) — Digester.java:69-78,121-143.
- ``digest(alg, seed)``: HMAC-alg keyed with
  PBKDF2WithHmac<alg>(seed, STATIC_SALT, 100000 iters, keyLen =
  mac output length) — Digester.java:145-192.
- result encodings: lower/upper hex, base64 — BytesValueProducer.java:52-62.

Unseeded SHA-224/256/384/512 and MD5 stay fully JVM-side
(``F.sha2``/``F.md5`` over a null-skipping concat). The seeded variant
needs PBKDF2+HMAC — a pandas UDF over ``hashlib``/``hmac`` with the
exact static salt; the PBKDF2 key derivation runs once per executor
(module-level cache), not per row.
"""

from __future__ import annotations

import functools
import hashlib
import hmac as hmac_mod

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

# Digester.java:176-181 — "divolte" + 8 fixed bytes, 100000 iterations.
STATIC_SALT = b"divolte" + bytes([0xB6, 0x87, 0xE2, 0xD9, 0xAA, 0x06, 0x03, 0x72])
PBKDF2_ITERATIONS = 100_000

_HASHLIB_NAMES = {
    "MD5": "md5",
    "SHA-1": "sha1",
    "SHA-224": "sha224",
    "SHA-256": "sha256",
    "SHA-384": "sha384",
    "SHA-512": "sha512",
}


def digest_concat(*pieces: Column) -> Column:
    """Ordered concatenation of UTF-8 pieces with absent pieces skipped
    (string columns; binary columns pass through)."""
    coalesced = [
        F.coalesce(p.cast("binary"), F.lit(b"")) for p in pieces
    ]
    return F.concat(*coalesced) if coalesced else F.lit(b"")


def digest(algorithm: str, *pieces: Column) -> Column:
    """``digest(alg).add(...)...result()`` -> binary digest column."""
    data = digest_concat(*pieces)
    if algorithm in ("SHA-224", "SHA-256", "SHA-384", "SHA-512"):
        bits = int(algorithm.split("-")[1])
        return F.unhex(F.sha2(data, bits))
    if algorithm == "MD5":
        return F.unhex(F.md5(data))
    if algorithm == "SHA-1":
        return F.unhex(F.sha1(data))
    name = _HASHLIB_NAMES.get(algorithm)
    if name is None:
        raise ValueError(f"Algorithm not supported for digester: {algorithm}")
    return _py_digest_udf(name)(data)


@functools.lru_cache(maxsize=64)
def _derive_hmac_key(algorithm: str, seed: str) -> bytes:
    name = _HASHLIB_NAMES[algorithm]
    key_len = hashlib.new(name).digest_size  # HMAC key len == mac output len
    return hashlib.pbkdf2_hmac(name, seed.encode("utf-8"), STATIC_SALT,
                               PBKDF2_ITERATIONS, dklen=key_len)


def seeded_digest(algorithm: str, seed: str, *pieces: Column) -> Column:
    """``digest(alg, seed)`` -> HMAC bytes keyed via PBKDF2(seed, salt)."""
    if algorithm not in _HASHLIB_NAMES:
        raise ValueError(f"Algorithm not supported for digester: {algorithm}")
    name = _HASHLIB_NAMES[algorithm]
    data = digest_concat(*pieces)

    @pandas_udf(T.BinaryType())
    def hmac_udf(s: pd.Series) -> pd.Series:
        key = _derive_hmac_key(algorithm, seed)
        return s.map(
            lambda b: None if b is None else hmac_mod.new(key, bytes(b), name).digest(),
            na_action="ignore",
        )

    return hmac_udf(data)


def _py_digest_udf(hashlib_name: str):
    @pandas_udf(T.BinaryType())
    def py_digest(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else hashlib.new(hashlib_name, bytes(b)).digest(),
            na_action="ignore",
        )

    return py_digest


def to_hex_lower(b: Column) -> Column:
    return F.lower(F.hex(b))


def to_hex_upper(b: Column) -> Column:
    return F.upper(F.hex(b))


def to_base64(b: Column) -> Column:
    return F.base64(b)

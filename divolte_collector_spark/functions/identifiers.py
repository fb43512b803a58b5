"""Divolte identifiers (reference C1/C2).

``DivolteIdentifier`` = ``"0:" + base36(timestampMillis) + ":" + id``
— three colon-separated parts, version '0', with an extractable
timestamp (DivolteIdentifier.java:55-61,79-89).  The base36 digits are
lowercase (Java ``Long.toString(ts, 36)``).

All expressions are built-in (``conv``/``split``/``concat``) — no UDF.
"""

from __future__ import annotations

import secrets

from pyspark.sql import Column
from pyspark.sql import functions as F

VERSION = "0"


def make_identifier(ts_millis: Column, unique_id: Column) -> Column:
    """Build a divolte identifier from epoch-millis + a unique id part."""
    return F.concat(
        F.lit(VERSION + ":"),
        F.lower(F.conv(ts_millis.cast("string"), 10, 36)),
        F.lit(":"),
        unique_id.cast("string"),
    )


def identifier_timestamp(identifier: Column) -> Column:
    """Recover epoch-millis from an identifier (DivolteIdentifier.java:79-89)."""
    return F.conv(F.split_part(identifier, F.lit(":"), F.lit(2)), 36, 10).cast("long")


def identifier_version(identifier: Column) -> Column:
    return F.split_part(identifier, F.lit(":"), F.lit(1))


def identifier_id(identifier: Column) -> Column:
    return F.split_part(identifier, F.lit(":"), F.lit(3))


def generate_identifier(ts_millis: int | None = None) -> str:
    """Driver-side generation (server flavor: random 64-bit id,
    DivolteIdentifier.java:94-106 uses a random token; format parity
    is what matters, not the RNG)."""
    import time

    ts = int(time.time() * 1000) if ts_millis is None else ts_millis
    def b36(n: int) -> str:
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"
        if n == 0:
            return "0"
        out = []
        while n:
            n, r = divmod(n, 36)
            out.append(digits[r])
        return "".join(reversed(out))

    return f"{VERSION}:{b36(ts)}:{secrets.token_urlsafe(8)}"

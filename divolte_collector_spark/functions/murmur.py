"""Pure-Python MurmurHash3 (public-domain algorithm by Austin Appleby).

The reference uses murmur3 in two places:

- request checksum: Guava ``Hashing.murmur3_32().hashString(s, UTF_8)``
  compared as a signed 32-bit int
  (ClientSideCookieEventHandler.java:207,220-231);
- duplicate memory + party affinity: murmur3_128 low/high longs
  (ShortTermDuplicateMemory.java:108-178, processing/Item.java:33-47).

``mmh3`` is not available in this environment, so the algorithm is
implemented here; it is only ever executed inside Arrow-batched pandas
UDFs (never row-at-a-time in the JVM hot path).
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF
_MASK64 = 0xFFFFFFFFFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit. Returns the *unsigned* 32-bit hash."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    n = len(data)
    nblocks = n >> 2
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


def murmur3_32_signed(data: bytes, seed: int = 0) -> int:
    """As Java's ``HashCode.asInt()``: two's-complement signed 32-bit."""
    h = murmur3_32(data, seed)
    return h - (1 << 32) if h >= (1 << 31) else h


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit. Returns (h1, h2) as unsigned 64-bit ints.

    Guava's ``murmur3_128().hashBytes(...).asBytes()`` is h1 then h2
    little-endian; the reference takes bytes 0-3 as the slot selector
    and bytes 4-11 as the signature (ShortTermDuplicateMemory.java:150-167).
    """
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & _MASK64
    n = len(data)
    nblocks = n >> 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[16 * i : 16 * i + 8], "little")
        k2 = int.from_bytes(data[16 * i + 8 : 16 * i + 16], "little")
        k1 = (k1 * c1) & _MASK64
        k1 = ((k1 << 31) | (k1 >> 33)) & _MASK64
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = ((h1 << 27) | (h1 >> 37)) & _MASK64
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = ((k2 << 33) | (k2 >> 31)) & _MASK64
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = ((h2 << 31) | (h2 >> 33)) & _MASK64
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    for i in range(min(t, 16) - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    for i in range(min(t, 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    if t > 8:
        k2 = (k2 * c2) & _MASK64
        k2 = ((k2 << 33) | (k2 >> 31)) & _MASK64
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if t > 0:
        k1 = (k1 * c1) & _MASK64
        k1 = ((k1 << 31) | (k1 >> 33)) & _MASK64
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2

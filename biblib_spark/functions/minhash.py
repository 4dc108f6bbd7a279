"""MinHash-LSH signatures over character shingles (C2 of SURVEY.md §2.8).

Custom implementation (not pyspark.ml.feature.MinHashLSH) so the shingle /
signature configuration is explicit and deterministic — the correctness gate
requires "identical shingle/signature config" (BASELINE.json north_rule).

Vectorized: shingles are hashed with zlib.crc32 (C speed), permutations are a
single numpy broadcast ``min((a*x + b) mod p)`` per record. Band keys encode
(band_index, 56-bit band hash) in one int64 so the LSH join key is a single
long column next to year_key.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MERSENNE61 = (1 << 61) - 1
_BAND_HASH_BITS = 56


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic permutation coefficients from the seed (no RNG state)."""
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        d = hashlib.md5(f"minhash|{seed}|{i}".encode()).digest()
        # a < 2^31 and shingle hashes < 2^32 keep a*x + b below 2^64
        # (no uint64 wraparound before the mod-p reduction)
        a[i] = (int.from_bytes(d[:8], "little") % ((1 << 31) - 2)) + 1
        b[i] = int.from_bytes(d[8:16], "little") % _MERSENNE61
    return a, b


def shingles(text: str, k: int) -> np.ndarray:
    """crc32 hashes of the k-char shingle set (whole string if shorter)."""
    if len(text) <= k:
        if not text:
            return np.empty(0, dtype=np.uint64)
        return np.array([zlib.crc32(text.encode("utf-8"))], dtype=np.uint64)
    data = text.encode("utf-8")
    # shingle over characters, not bytes, to be encoding-stable
    seen = {zlib.crc32(text[i : i + k].encode("utf-8")) for i in range(len(text) - k + 1)}
    del data
    return np.fromiter(seen, dtype=np.uint64, count=len(seen))


def minhash_signature(
    sh: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray | None:
    """num_perm-wide signature; None for empty shingle sets."""
    if sh.size == 0:
        return None
    # (num_perm, n) broadcast in uint64; (a*x+b) mod p with p = 2^61-1 keeps
    # products within uint64 after reduction of x to < 2^32 (crc32 values)
    vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE61
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Hash each band of the signature to one int64 join key."""
    rows = sig.shape[0] // bands
    out = []
    for i in range(bands):
        band = sig[i * rows : (i + 1) * rows]
        h = hashlib.md5(band.tobytes() + bytes([i])).digest()
        hv = int.from_bytes(h[:8], "little") & ((1 << _BAND_HASH_BITS) - 1)
        out.append((i << _BAND_HASH_BITS) | hv)
    return out


def make_band_keys_udf(k: int, num_perm: int, bands: int, seed: int):
    """pandas UDF: norm_title -> array<long> of LSH band keys."""
    assert num_perm % bands == 0, "num_perm must be divisible by bands"

    @pandas_udf(ArrayType(LongType()))
    def band_keys_udf(titles: pd.Series) -> pd.Series:
        a, b = _perm_params(num_perm, seed)

        def _one(t: object) -> list[int]:
            if not isinstance(t, str) or not t:
                return []
            sig = minhash_signature(shingles(t, k), a, b)
            if sig is None:
                return []
            return band_keys(sig, bands)

        return titles.map(_one)

    return band_keys_udf

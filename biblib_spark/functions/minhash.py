"""MinHash-LSH signatures over character shingles (C2 of SURVEY.md §2.8).

Custom implementation (not pyspark.ml.feature.MinHashLSH) so the shingle /
signature configuration is explicit and deterministic — the correctness gate
requires "identical shingle/signature config" (BASELINE.json north_rule):
k-char shingles, num_perm permutations min((a*x + b) mod p), band keys over
num_perm/bands-wide bands.

Fully vectorized (this chain was ~40% of the fused parse+feature kernel's
CPU before):
- shingle hash = 32-bit polynomial over the CODEPOINTS of each k-char window
  (numpy sliding windows over the utf-32 view — identical hash for the same
  shingle in ASCII and non-ASCII records);
- signatures for a whole Arrow batch in one (num_perm x total_shingles)
  broadcast + segmented ``np.minimum.reduceat``;
- band keys by arithmetic mixing over the (n, bands, rows) cube — no
  per-band hashlib calls.
Band keys encode (band_index, 56-bit band hash) in one int64 so the LSH
join key is a single long column next to year_key.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MERSENNE61 = (1 << 61) - 1
_BAND_HASH_BITS = 56
_POLY = np.uint64(1000003)
_MASK32 = np.uint64(0xFFFFFFFF)
# splitmix64-style mixing constants for band folding
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xFF51AFD7ED558CCD)
# chunk the (num_perm x total_shingles) broadcast so the working set
# (num_perm * chunk * 8B = 2 MB) stays cache-resident even with a full
# complement of concurrent workers — a 64k chunk (33 MB) streams through
# DRAM and measured 60% slower under 8 pinned workers
_SIG_CHUNK_SHINGLES = 4096


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
    """32-bit polynomial hashes of the k-char shingle set (whole string if
    shorter). Vectorized: utf-32 view -> sliding windows -> Horner fold."""
    n = len(text)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    win = (
        cps[None, :]
        if n <= k
        else np.lib.stride_tricks.sliding_window_view(cps, k)
    )
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(win.shape[1]):
        h = h * _POLY + win[:, j]  # uint64 wrap is part of the hash
    h &= _MASK32
    # murmur fmix32 avalanche: the raw polynomial over few low-entropy
    # codepoints leaves structure that measurably degrades the min-hash
    # Jaccard estimator; the finalizer restores it
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & _MASK32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & _MASK32
    h ^= h >> np.uint64(16)
    return np.unique(h)


def minhash_signature(
    sh: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray | None:
    """num_perm-wide signature; None for empty shingle sets."""
    if sh.size == 0:
        return None
    # (num_perm, n) broadcast in uint64; (a*x+b) mod p with p = 2^61-1 keeps
    # products within uint64 after reduction of x to < 2^32
    vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE61
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Hash each band of the signature to one int64 join key."""
    return band_keys_matrix(sig[None, :].astype(np.uint64), bands)[0].tolist()


def band_keys_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signatures -> (n, bands) int64 band keys, vectorized."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    cube = sigs.reshape(n, bands, rows)
    h = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows):
        h ^= cube[:, :, j] * _MIX1
        h ^= h >> np.uint64(33)
        h *= _MIX2  # interleaved mixing keeps the fold order-sensitive
    h &= np.uint64((1 << _BAND_HASH_BITS) - 1)
    h |= np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(
        _BAND_HASH_BITS
    )
    return h.astype(np.int64)


def lsh_keys_batch(
    titles: list, k: int, a: np.ndarray, b: np.ndarray, bands: int
) -> list[list[int]]:
    """Batch API: normalized titles -> per-title LSH band-key lists.

    One segmented broadcast per ~64k shingles instead of one small numpy
    round-trip per record."""
    n = len(titles)
    out: list[list[int]] = [[]] * n
    shs: list[tuple[int, np.ndarray]] = []
    for i, t in enumerate(titles):
        if isinstance(t, str) and t:
            sh = shingles(t, k)
            if sh.size:
                shs.append((i, sh))
    pos = 0
    while pos < len(shs):
        # grow the chunk until the shingle budget is hit
        end = pos
        total = 0
        while end < len(shs) and (total == 0 or total + shs[end][1].size <= _SIG_CHUNK_SHINGLES):
            total += shs[end][1].size
            end += 1
        idxs = [i for i, _ in shs[pos:end]]
        arrs = [sh for _, sh in shs[pos:end]]
        concat = np.concatenate(arrs)
        offsets = np.cumsum([0] + [s.size for s in arrs[:-1]])
        vals = (a[:, None] * concat[None, :] + b[:, None]) % _MERSENNE61
        sigs = np.minimum.reduceat(vals, offsets, axis=1).T  # (chunk_n, num_perm)
        keys = band_keys_matrix(sigs.astype(np.uint64), bands)
        for row, i in enumerate(idxs):
            out[i] = keys[row].tolist()
        pos = end
    return out


def make_band_keys_udf(k: int, num_perm: int, bands: int, seed: int):
    """pandas UDF: norm_title -> array<long> of LSH band keys."""
    assert num_perm % bands == 0, "num_perm must be divisible by bands"

    @pandas_udf(ArrayType(LongType()))
    def band_keys_udf(titles: pd.Series) -> pd.Series:
        a, b = _perm_params(num_perm, seed)
        return pd.Series(lsh_keys_batch(titles.tolist(), k, a, b, bands))

    return band_keys_udf

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


def _perm_vals_mod_m61(
    a: np.ndarray, x: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(a[:,None] * x[None,:] + b[:,None]) % (2^61-1), bit-identical to the
    ``%`` expression but via the Mersenne shift/add reduction.

    numpy's uint64 ``%`` by a non-power-of-2 goes through a scalar divide
    per element — the single hottest instruction of the whole parse+feature
    kernel (81 us/record at 64 perms). With a < 2^31 and x < 2^32 the
    product a*x + b stays below 2^64 (no wraparound), so
    v mod (2^61-1) == ((v & M) + (v >> 61)) with one conditional subtract
    (v >> 61 <= 7, so one pass suffices). In-place ops throughout — the
    out/where subtract leaves non-selected lanes untouched. Measured 3.7x
    on the (64 x 40k) broadcast; equality property-tested in
    tests/test_minhash.py."""
    v = np.multiply(a[:, None], x[None, :])
    v += b[:, None]
    hi = v >> np.uint64(61)
    v &= _M61_U
    v += hi
    np.subtract(v, _M61_U, out=v, where=v >= _M61_U)
    return v


_M61_U = np.uint64(_MERSENNE61)


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
    # murmur fmix32 avalanche: the raw polynomial over few low-entropy
    # codepoints leaves structure that measurably degrades the min-hash
    # Jaccard estimator; the finalizer restores it
    return np.unique(_fmix32(h & _MASK32))


def minhash_signature(
    sh: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray | None:
    """num_perm-wide signature; None for empty shingle sets."""
    if sh.size == 0:
        return None
    # (num_perm, n) broadcast in uint64; (a*x+b) mod p with p = 2^61-1 keeps
    # products within uint64 after reduction of x to < 2^32
    vals = _perm_vals_mod_m61(a, sh, b)
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Hash each band of the signature to one int64 join key."""
    return band_keys_matrix(sig[None, :].astype(np.uint64), bands)[0].tolist()


def band_keys_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signatures -> (n, bands) int64 band keys, vectorized.
    A num_perm not divisible by bands ignores the tail permutations (same
    semantics as the original per-band slicing)."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    cube = sigs[:, : bands * rows].reshape(n, bands, rows)
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


def _fmix32(h: np.ndarray) -> np.ndarray:
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & _MASK32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & _MASK32
    h ^= h >> np.uint64(16)
    return h


def _batch_shingle_hashes(
    titles_long: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """All k-windows of all (len > k) titles hashed in ONE numpy pass.

    Titles are concatenated with a non-codepoint separator; every window is
    Horner-hashed in one vectorized sweep, then the windows that lie fully
    inside each title are gathered by index (windows touching a separator
    are simply never selected). Returns (hashes, reduceat offsets). Hash
    values are identical to ``shingles()``, just WITHOUT the per-record
    dedup — min-hash over a multiset equals min-hash over its set, so the
    signatures are unchanged while the O(n log n) per-record unique and the
    per-record numpy round-trips disappear.
    """
    sep = np.uint64(1) << np.uint64(40)  # no unicode codepoint reaches 2^40
    parts: list[np.ndarray] = []
    for t in titles_long:
        parts.append(
            np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        )
        parts.append(np.array([sep], dtype=np.uint64))
    concat = np.concatenate(parts)
    win = np.lib.stride_tricks.sliding_window_view(concat, k)
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(k):
        h = h * _POLY + win[:, j]
    h = _fmix32(h & _MASK32)

    lens = np.fromiter((len(t) for t in titles_long), dtype=np.int64)
    counts = lens - k + 1  # valid windows per title (all lens > k here)
    starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]  # +1 per separator
    total = int(counts.sum())
    # grouped arange: global window index of each valid window
    grp_start = np.concatenate(([0], np.cumsum(counts)))[:-1]
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(grp_start, counts)
        + np.repeat(starts, counts)
    )
    return h[idx], grp_start


def lsh_keys_batch(
    titles: list, k: int, a: np.ndarray, b: np.ndarray, bands: int
) -> list[list[int]]:
    """Batch API: normalized titles -> per-title LSH band-key lists.

    One concatenated window-hash pass + one segmented signature broadcast
    per ~4k shingles instead of numpy round-trips per record."""
    n = len(titles)
    out: list[list[int]] = [[] for _ in range(n)]
    long_idx: list[int] = []
    long_titles: list[str] = []
    short: list[tuple[int, np.ndarray]] = []  # rare: 0 < len <= k
    for i, t in enumerate(titles):
        if not isinstance(t, str) or not t:
            continue
        if len(t) > k:
            long_idx.append(i)
            long_titles.append(t)
        else:
            short.append((i, shingles(t, k)))

    if long_titles:
        hashes, offsets = _batch_shingle_hashes(long_titles, k)
        row = 0
        pos = 0
        total_rows = len(long_titles)
        bounds = np.concatenate((offsets, [hashes.size]))
        while row < total_rows:
            end_row = row
            while (
                end_row < total_rows
                and (
                    end_row == row
                    or bounds[end_row + 1] - bounds[row] <= _SIG_CHUNK_SHINGLES
                )
            ):
                end_row += 1
            lo, hi = bounds[row], bounds[end_row]
            vals = _perm_vals_mod_m61(a, hashes[lo:hi], b)
            sigs = np.minimum.reduceat(
                vals, (bounds[row:end_row] - lo).astype(np.int64), axis=1
            ).T
            keys = band_keys_matrix(sigs.astype(np.uint64), bands)
            for r in range(row, end_row):
                out[long_idx[r]] = keys[r - row].tolist()
            row = end_row

    for i, sh in short:
        sig = minhash_signature(sh, a, b)
        if sig is not None:
            out[i] = band_keys(sig, bands)
    return out


def band_keys_from_hash_arrays(
    hash_arrays: list, a: np.ndarray, b: np.ndarray, bands: int
) -> list[list[int]]:
    """Per-document LSH band keys from PRE-HASHED shingle sets.

    The code arm shingles on token n-grams whose 64-bit hashes are already
    computed in the feature kernel (operators/codedup.py); re-shingling the
    raw text chars here would repeat that work ~5x over. Each document's
    hash set is folded to the 32-bit domain the permutation arithmetic
    requires (a*x + b stays under 2^64 only for x < 2^32), then the same
    chunked ``np.minimum.reduceat`` signature broadcast as
    ``lsh_keys_batch`` runs over the concatenation. Empty sets produce no
    keys (the document simply generates no tier-M candidates).
    """
    n = len(hash_arrays)
    out: list[list[int]] = [[] for _ in range(n)]
    idx: list[int] = []
    parts: list[np.ndarray] = []
    for i, h in enumerate(hash_arrays):
        arr = np.asarray(h, dtype=np.uint64)
        if arr.size:
            idx.append(i)
            parts.append(arr & _MASK32)
    if not parts:
        return out
    concat = np.concatenate(parts)
    counts = np.fromiter((p.size for p in parts), dtype=np.int64)
    bounds = np.concatenate(([0], np.cumsum(counts)))
    total_rows = len(parts)
    row = 0
    while row < total_rows:
        end_row = row
        while end_row < total_rows and (
            end_row == row
            or bounds[end_row + 1] - bounds[row] <= _SIG_CHUNK_SHINGLES
        ):
            end_row += 1
        lo, hi = bounds[row], bounds[end_row]
        vals = _perm_vals_mod_m61(a, concat[lo:hi], b)
        sigs = np.minimum.reduceat(
            vals, (bounds[row:end_row] - lo).astype(np.int64), axis=1
        ).T
        keys = band_keys_matrix(sigs.astype(np.uint64), bands)
        for r in range(row, end_row):
            out[idx[r]] = keys[r - row].tolist()
        row = end_row
    return out


def make_band_keys_udf(k: int, num_perm: int, bands: int, seed: int):
    """pandas UDF: norm_title -> array<long> of LSH band keys."""
    assert num_perm % bands == 0, "num_perm must be divisible by bands"

    @pandas_udf(ArrayType(LongType()))
    def band_keys_udf(titles: pd.Series) -> pd.Series:
        a, b = _perm_params(num_perm, seed)
        return pd.Series(lsh_keys_batch(titles.tolist(), k, a, b, bands))

    return band_keys_udf

"""MinHash kernel: batch/scalar parity, unicode consistency, LSH guarantees."""

from __future__ import annotations

import random

import numpy as np

from biblib_spark.functions.minhash import (
    _perm_params,
    band_keys,
    lsh_keys_batch,
    minhash_signature,
    shingles,
)

A, B = _perm_params(64, 1815)


def test_batch_matches_scalar_path():
    random.seed(3)
    words = ["analysis", "renal", "étude", "niño", "Ω-data", "cohort"]
    titles = [
        "".join(random.choice(words) for _ in range(random.randrange(0, 8)))
        for _ in range(500)
    ] + ["", "a", "abc", "abcd", "abcde", None, 42]
    batch = lsh_keys_batch(titles, 4, A, B, 16)
    for t, keys in zip(titles, batch):
        if not isinstance(t, str) or not t:
            assert keys == []
        else:
            sig = minhash_signature(shingles(t, 4), A, B)
            assert keys == ([] if sig is None else band_keys(sig, 16))


def test_shingle_hash_consistent_across_scripts():
    """The same k-char shingle must hash identically whether it appears in
    an ASCII-only or a mixed-script title (codepoint polynomial, not bytes)."""
    sa = set(shingles("abcdef", 4).tolist())
    sb = set(shingles("abcdéf", 4).tolist())
    shared = set(shingles("abcd", 4).tolist())  # 'abcd' occurs in both
    assert shared <= sa and shared <= sb


def test_identical_titles_share_all_bands_and_diverse_do_not():
    k1 = lsh_keys_batch(["randomized renal outcomes"], 4, A, B, 16)[0]
    k2 = lsh_keys_batch(["randomized renal outcomes"], 4, A, B, 16)[0]
    k3 = lsh_keys_batch(["completely different title xyz"], 4, A, B, 16)[0]
    assert k1 == k2 and len(k1) == 16
    assert not set(k1) & set(k3)
    # band index rides the top bits: 16 distinct band slots
    assert sorted(k >> 56 for k in k1) == list(range(16))


def test_signature_is_jaccard_estimator():
    """Sanity: mean |estimate - Jaccard| over many pairs is within the
    64-permutation sampling error (single pairs can be ~3 sigma off)."""
    rng = random.Random(11)
    words = "alpha beta gamma delta renal outcome trial cohort imaging".split()
    errs = []
    for _ in range(30):
        base = [rng.choice(words) for _ in range(8)]
        mod = list(base)
        for i in rng.sample(range(8), rng.randrange(1, 5)):
            mod[i] = rng.choice(words)
        t1, t2 = "".join(base), "".join(mod)
        s1, s2 = shingles(t1, 4), shingles(t2, 4)
        jac = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
        est = float(
            (minhash_signature(s1, A, B) == minhash_signature(s2, A, B)).mean()
        )
        errs.append(abs(est - jac))
    assert sum(errs) / len(errs) < 0.1


def test_mersenne_reduction_matches_modulo():
    """_perm_vals_mod_m61 must be bit-identical to the plain ``%`` it
    replaced (the Mersenne shift/add fast path), across the full input
    domain: a < 2^31, b < 2^61-1, x < 2^32, including the extremes."""
    from biblib_spark.functions.minhash import _MERSENNE61, _perm_vals_mod_m61

    rng = np.random.default_rng(7)
    a = np.concatenate(
        [
            np.array([1, (1 << 31) - 2], dtype=np.uint64),
            rng.integers(1, (1 << 31) - 1, 62).astype(np.uint64),
        ]
    )
    b = np.concatenate(
        [
            np.array([0, _MERSENNE61 - 1], dtype=np.uint64),
            rng.integers(0, _MERSENNE61, 62).astype(np.uint64),
        ]
    )
    x = np.concatenate(
        [
            np.array([0, 1, (1 << 32) - 1], dtype=np.uint64),
            rng.integers(0, 1 << 32, 4093).astype(np.uint64),
        ]
    )
    ref = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MERSENNE61)
    assert np.array_equal(_perm_vals_mod_m61(a, x, b), ref)

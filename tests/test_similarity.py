"""Jaro / Jaro-Winkler parity with strsim 0.11.1 (the reference's pinned dep).

Expected values are strsim's own published doc/README assertions plus
hand-computed textbook values. The reference consumes these at thresholds
0.85/0.93/0.99 (/root/reference/src/dedupe.rs:141-142,625-648).
"""

import pytest

from biblib_spark.kernels.similarity import jaro, jaro_winkler


@pytest.mark.parametrize(
    ("a", "b", "expected"),
    [
        ("", "", 1.0),
        ("", "a", 0.0),
        ("a", "", 0.0),
        ("a", "a", 1.0),
        ("a", "b", 0.0),
        ("martha", "marhta", 0.9444444444444445),
        ("dixon", "dicksonx", 0.7666666666666666),
        ("dwayne", "duane", 0.8222222222222223),
        # strsim README: jaro("Friedrich Nietzsche", "Jean-Paul Sartre") ≈ 0.392
        ("Friedrich Nietzsche", "Jean-Paul Sartre", 0.392),
    ],
)
def test_jaro(a, b, expected):
    assert jaro(a, b) == pytest.approx(expected, abs=1e-3)


def test_jaro_winkler_uncapped_prefix():
    # strsim README: ≈ 0.911 — only holds with an UNCAPPED common prefix
    # (prefix "cheese" = 6 chars; the classic 4-cap would give ≈ 0.867).
    assert jaro_winkler("cheeseburger", "cheese fries") == pytest.approx(0.911, abs=1e-3)


def test_jaro_winkler_classic_values():
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111, abs=1e-6)
    assert jaro_winkler("", "") == 1.0
    assert jaro_winkler("same", "same") == 1.0


def test_jaro_winkler_clamped():
    # long identical prefix then small tail difference must not exceed 1.0
    a = "a" * 30 + "x"
    b = "a" * 30 + "y"
    assert jaro_winkler(a, b) <= 1.0


def test_threshold_band_behavior():
    # near-identical normalized titles used by the dedup predicate
    t1 = "machinelearninginhealthcare"
    t2 = "machinelearninginhealthcares"  # one char appended
    # (m/27 + m/28 + 1)/3 with m=27 → 0.98809...; JW lifts it above 0.99
    assert jaro(t1, t2) == pytest.approx(0.9880952380952381)
    assert jaro_winkler(t1, t2) >= 0.99
    t3 = "deeplearningforproteinfolding"
    assert jaro(t1, t3) < 0.85


# ---------------------------------------------------------------------------
# Batch (numpy block) kernel parity with the scalar reference kernels
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from biblib_spark.kernels.similarity import jaro_batch

_text = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs", "Cc")
    ),
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_text, _text, st.booleans()), min_size=1, max_size=50))
def test_jaro_batch_matches_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    wk = np.array([p[2] for p in pairs], dtype=bool)
    got = jaro_batch(a, b, winkler=wk)
    for i, (x, y, w) in enumerate(pairs):
        exp = jaro_winkler(x, y) if w else jaro(x, y)
        assert got[i] == pytest.approx(exp, abs=1e-12), (x, y, w)


def test_jaro_batch_empty_and_nul():
    assert jaro_batch([], []).shape == (0,)
    got = jaro_batch(["a\x00b", "", "xy"], ["a\x00b", "", "yx"])
    assert got[0] == 1.0 and got[1] == 1.0
    assert got[2] == pytest.approx(jaro("xy", "yx"), abs=1e-12)


def test_jaro_batch_mixed_lengths_cross_block():
    # lengths spanning several pad-width groups in one call
    a = ["x" * n for n in (0, 1, 5, 33, 70, 150, 301)]
    b = [("x" * (n - 1) + "y") if n else "" for n in (0, 1, 5, 33, 70, 150, 301)]
    got = jaro_batch(a, b)
    for i in range(len(a)):
        assert got[i] == pytest.approx(jaro(a[i], b[i]), abs=1e-12)


@settings(deadline=None, max_examples=300)
@given(st.lists(st.tuples(_text, _text), min_size=1, max_size=40))
def test_jvm_gate_upper_bounds(pairs):
    """The verify stage-1 JVM gate (operators/verify.py) prunes a pair only
    when its similarity provably cannot reach the arm threshold. Property:
    the Python mirror of the gate's bound dominates the exact kernels.

    - jaro(a, b) <= (2 + lmin/lmax) / 3
    - jaro_winkler(a, b) <= j_ub + 0.1 * p * (1 - j_ub) for common prefix
      p < 8 (the gate keeps p >= 8 pairs unconditionally)
    """
    for a, b in pairs:
        la, lb = len(a), len(b)
        r = (min(la, lb) / max(la, lb)) if max(la, lb) > 0 else 1.0
        j_ub = (2.0 + r) / 3.0
        assert jaro(a, b) <= j_ub + 1e-12, (a, b)
        p = 0
        for ca, cb in zip(a, b):
            if ca != cb:
                break
            p += 1
        if p < 8:
            jw_ub = j_ub + 0.1 * p * (1.0 - j_ub)
            assert jaro_winkler(a, b) <= jw_ub + 1e-12, (a, b)

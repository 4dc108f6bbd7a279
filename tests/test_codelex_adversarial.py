"""Adversarial-corpus quantification of the lexer normalizer's documented
limits (kernels/codelex.py:34-38): JS regex literals, unterminated strings,
shell here-docs.

The round-4 verdict's ask: measure the type-1 tier's miss rate on code the
single-pass lexer cannot disambiguate (all three constructs need a parser,
not a lexer), and assert the tiered matcher's OTHER tiers (MinHash Jaccard,
winnowing containment) recover every missed clone pair — the absorb claim
the codelex docstring makes, now tested instead of asserted.

Each adversarial pair is a true type-1 clone BY CONSTRUCTION: the two
variants differ only in comments and code layout outside string semantics,
so a spec-perfect normalizer maps both to one canonical text. The measured
quantity is how often the lexer's norm hashes agree anyway.
"""

from __future__ import annotations

import pandas as pd

from biblib_spark.kernels.codelex import normalize_code_lexed
from biblib_spark.operators.codedup import code_dup_clusters, norm_hash_py

# ---------------------------------------------------------------------------
# corpus: (category, lang, variant_a, variant_b) — every pair a true type-1
# clone (identical modulo comments + inter-token layout). Bodies are padded
# with enough shared real code that a localized lexer corruption leaves
# token-4-gram Jaccard >= 0.6 — the condition under which tier M/W absorb a
# tier-N miss (a short adversarial file with nothing else in it is NOT
# recoverable by any similarity tier, and not representative of real code).
# ---------------------------------------------------------------------------

_JS_PAD = """
function parseEntry(line, idx) {
    var parts = line.split('\\t');
    var key = parts[0];
    var value = parts.length > 1 ? parts[1] : null;
    if (key.length === 0) { return null; }
    return { key: key, value: value, index: idx };
}
function collect(lines) {
    var out = [];
    for (var i = 0; i < lines.length; i++) {
        var e = parseEntry(lines[i], i);
        if (e !== null) { out.push(e); }
    }
    return out;
}
"""

_PY_PAD = """
def parse_entry(line, idx):
    parts = line.split('\\t')
    key = parts[0]
    value = parts[1] if len(parts) > 1 else None
    if len(key) == 0:
        return None
    return (key, value, idx)

def collect(lines):
    out = []
    for i, ln in enumerate(lines):
        e = parse_entry(ln, i)
        if e is not None:
            out.append(e)
    return out
"""

_SH_PAD = """
parse_entry() {
    local line="$1"
    local idx="$2"
    local key="${line%%:*}"
    local value="${line#*:}"
    if [ -z "$key" ]; then return 1; fi
    printf '%s=%s (%s)' "$key" "$value" "$idx"
}
collect() {
    local i=0
    while read -r ln; do
        parse_entry "$ln" "$i" && i=$((i+1))
    done
}
"""

PAIRS = [
    # -- JS regex literals: the // inside /…\/\// opens a bogus line comment,
    #    eating whatever follows on that line; variants arrange real code
    #    before/after the regex differently, so the two corruptions differ.
    (
        "js_regex", "javascript",
        _JS_PAD + "function isUrl(u) { var re = /https?:\\/\\//; return re.test(u); } // scheme check\n",
        _JS_PAD + "function isUrl(u) {\n  var re = /https?:\\/\\//;\n  return re.test(u);\n} /* scheme check */\n",
    ),
    (
        "js_regex", "javascript",
        _JS_PAD + "var SEP = /\\/\\//g; function strip(s) { return s.replace(SEP, ''); } // strip slashes\n",
        _JS_PAD + "var SEP = /\\/\\//g;\nfunction strip(s) {\n  return s.replace(SEP, '');\n}\n",
    ),
    (
        "js_regex", "javascript",
        _JS_PAD + "function proto(u) { return /^\\w+:\\/\\//.exec(u); } // protocol\n",
        _JS_PAD + "function proto(u) {\n  return /^\\w+:\\/\\//.exec(u);  // protocol\n}\n",
    ),
    # -- unterminated string: the final line opens a literal that never
    #    closes (truncated checkout / generator bug); the lexer falls
    #    through to code mode, where a marker inside the tail is stripped
    #    as a comment in a layout-dependent way.
    (
        "unterminated", "python",
        _PY_PAD + "BANNER = \"usage: tool # see docs\nrest = 1\n",
        _PY_PAD + "BANNER = \"usage: tool # see docs\n\n\nrest = 1\n",
    ),
    (
        "unterminated", "javascript",
        _JS_PAD + "var msg = \"done // not a comment\nvar after = 2; // real\n",
        _JS_PAD + "var msg = \"done // not a comment\nvar after = 2;\n",
    ),
    # -- shell here-doc: the body is STRING per the shell spec, but the
    #    lexer has no here-doc state, so a # inside the body is stripped
    #    as a comment; variants place distinct real comments around it.
    (
        "heredoc", "shell",
        _SH_PAD + "cat <<EOF\nvalue # kept by the shell\nEOF\n# trailing note\n",
        _SH_PAD + "cat <<EOF\nvalue # kept by the shell\nEOF\n    # different trailing note\n",
    ),
    (
        "heredoc", "shell",
        _SH_PAD + "cat <<MARK # emit\nalpha # one\nMARK\n",
        _SH_PAD + "cat <<MARK   # emit config\nalpha # one\nMARK\n",
    ),
    # -- control: ordinary comment/layout variants the lexer must catch.
    (
        "control", "python",
        _PY_PAD + "LIMIT = 10  # cap\n",
        _PY_PAD + "LIMIT = 10          # a different cap comment\n",
    ),
    (
        "control", "javascript",
        _JS_PAD + "var LIMIT = 10; // cap\n",
        _JS_PAD + "var LIMIT = 10; /* other */\n",
    ),
]


def _norm_verdicts():
    """category -> [lexer-type-1-hit, ...] per pair."""
    out: dict[str, list[bool]] = {}
    for cat, lang, a, b in PAIRS:
        ha = norm_hash_py(normalize_code_lexed(a, lang))
        hb = norm_hash_py(normalize_code_lexed(b, lang))
        out.setdefault(cat, []).append(ha == hb)
    return out


def test_lexer_miss_rate_measured():
    """The documented limits are real and quantified: the lexer must catch
    every control pair, and the adversarial categories' miss rates are
    pinned (a future lexer improvement that changes them shows up here,
    not silently). Measured rates are documented in SURVEY.md §2.12 K2."""
    v = _norm_verdicts()
    assert all(v["control"]), f"control pairs must be type-1 hits: {v}"
    # JS regex literals: the bogus-comment corruption eats the rest of the
    # line AFTER the regex, so it is layout-COUPLED — variants that arrange
    # code around the regex differently corrupt differently. Measured miss
    # rate on this slice: 3/3.
    assert v["js_regex"] == [False, False, False]
    # unterminated strings: fall-through to code mode corrupts
    # DETERMINISTICALLY (strip marker-to-EOL, collapse whitespace), so both
    # variants of a true clone corrupt identically and the type-1 tier
    # still unifies them — recall is unharmed; the hazard is precision
    # (false merges), measured separately below. Miss rate: 0/2.
    assert v["unterminated"] == [True, True]
    # here-docs: same determinism — the in-body # is stripped the SAME way
    # in both variants (and a # after the <<MARK operator is a real shell
    # comment anyway). Miss rate: 0/2.
    assert v["heredoc"] == [True, True]


def test_lexer_false_merge_on_unterminated_tail():
    """The unterminated-string limit's REAL failure mode, pinned: two files
    that differ only inside the unterminated literal's tail collapse to one
    norm hash (the bogus comment-strip deletes the differing region), so
    the type-1 tier claims a clone pair that is not one. This is a
    precision limit of tier N only — it adds an edge, never drops one, so
    the north_rule's dup-pair RECALL metric is unaffected — and it needs a
    parser, not a lexer, to close (kernels/codelex.py:34-38)."""
    a = _JS_PAD + 'var msg = "done // tail one\n'
    b = _JS_PAD + 'var msg = "done // tail two\n'
    na = normalize_code_lexed(a, "javascript")
    nb = normalize_code_lexed(b, "javascript")
    assert na == nb  # differing tails were both eaten as comments
    assert norm_hash_py(na) == norm_hash_py(nb)


def test_missed_pairs_recovered_by_similarity_tiers(spark):
    """Every adversarial true-clone pair must land in ONE cluster through
    the full tiered matcher even where the type-1 tier missed it — the
    MinHash-Jaccard / winnowing tiers operate on the (identically
    corrupted or near-identical) token gram sets and absorb the miss."""
    rows = []
    rid = 0
    pair_ids = []
    for cat, lang, a, b in PAIRS:
        pair_ids.append((rid, rid + 1, cat))
        for variant in (a, b):
            rows.append(
                {
                    "row_id": rid,
                    "repo": f"adv/{cat}",
                    "path": f"{cat}/{rid}.{lang}",
                    "commit": "c0",
                    "lang": lang,
                    "content": variant,
                }
            )
            rid += 1
    files = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        r["row_id"]: r["cluster_id"]
        for r in code_dup_clusters(files, materialize="checkpoint").collect()
    }
    for a_id, b_id, cat in pair_ids:
        assert got[a_id] == got[b_id], (
            f"{cat} pair ({a_id},{b_id}) not recovered by the tiered matcher"
        )

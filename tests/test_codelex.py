"""Lexer-grade code normalizer (kernels/codelex.py) — string-literal safety.

The round-3 verdict's done-criterion: a string literal containing
``// not a comment`` and ``# nor this`` must round-trip through the type-1
tier unchanged, and the norm oracle entries stay green (driver-checked).
"""

import re

import pytest

from biblib_spark.kernels.codelex import normalize_code_lexed
from biblib_spark.operators.codedup import (
    lexed_norm_rows,
    norm_hash_py,
    normalize_code_py,
)


# ------------------------------------------------------ string-literal safety


def test_string_literal_with_comment_markers_survives():
    src = 'url = "http://example.com// not a comment# nor this"  # real comment\n'
    out = normalize_code_lexed(src, "python")
    assert '"http://example.com// not a comment# nor this"' in out
    assert "real comment" not in out
    # the regex twin corrupts exactly this case — that's why it was replaced
    assert "example.com" not in normalize_code_py(src)


def test_c_family_string_with_line_comment_marker():
    src = 'String u = "https://x.io/a"; // trailing\nint y = 2;'
    out = normalize_code_lexed(src, "java")
    assert '"https://x.io/a"' in out
    assert "trailing" not in out
    assert "int y = 2;" in out


def test_block_comment_marker_inside_string():
    src = 's = "/* not a block */"; /* real block\nspanning lines */ x = 1;'
    out = normalize_code_lexed(src, "go")
    assert '"/* not a block */"' in out
    assert "real block" not in out and "spanning" not in out
    assert "x = 1;" in out


def test_type1_hash_stable_under_layout_not_under_string_edit():
    a = 'u = "a // b"\nv = 1\n'
    b = 'u = "a // b"\n\n\n   v   =   1\n'  # layout-only change: same type-1
    c = 'u = "a//b"\nv = 1\n'  # edit INSIDE the literal: different
    ha, hb, hc = (norm_hash_py(n) for n in lexed_norm_rows([a, b, c], ["python"] * 3))
    assert ha == hb
    assert ha != hc


# ------------------------------------------------------- per-lang semantics


def test_python_floor_division_is_code():
    out = normalize_code_lexed("q = a // b\n", "python")
    assert out == "q = a // b"


def test_python_hash_comment_stripped_c_hash_kept():
    src = "x = 1 # note\n"
    assert "note" not in normalize_code_lexed(src, "python")
    # '#' is not a comment in the C family (e.g. a C preprocessor line or a
    # Java annotation-adjacent token must survive)
    assert "#include <stdio.h>" in normalize_code_lexed(
        "#include <stdio.h>\nint x; // c\n", "c"
    )


def test_python_triple_quoted_string_preserved():
    src = 's = """line1 # not comment\n  line2 // also text"""\ny = 1\n'
    out = normalize_code_lexed(src, "python")
    assert '"""line1 # not comment\n  line2 // also text"""' in out
    assert "y = 1" in out


def test_go_raw_and_js_template_literals():
    go = 'p := `raw\n// kept\n# kept`\n// dropped\n'
    out = normalize_code_lexed(go, "go")
    assert "`raw\n// kept\n# kept`" in out
    assert "dropped" not in out
    js = "const t = `a ${x} // kept`; // gone\n"
    outjs = normalize_code_lexed(js, "javascript")
    assert "`a ${x} // kept`" in outjs
    assert "gone" not in outjs


def test_escaped_quote_does_not_end_string():
    src = 's = "he said \\"hi // there\\"" // comment\n'
    out = normalize_code_lexed(src, "javascript")
    assert 'he said \\"hi // there\\"' in out
    assert "comment" not in out


def test_hash_family_and_unknown_lang_default():
    sh = 'echo "a # kept" # dropped\n'
    out = normalize_code_lexed(sh, "shell")
    assert '"a # kept"' in out and "dropped" not in out
    # unknown lang falls back to the C family: '#' untouched, '//' stripped
    unk = "x # kept\ny // dropped\n"
    out2 = normalize_code_lexed(unk, "brainfuck")
    assert "# kept" in out2 and "dropped" not in out2


def test_whitespace_collapsed_outside_strings_only():
    src = 'a  =  "two  spaces"   +\n\t b\n'
    out = normalize_code_lexed(src, "java")
    assert out == 'a = "two  spaces" + b'


# --------------------------------------------- regex-twin agreement property


def test_agreement_with_regex_twin_on_marker_free_code():
    """On code whose string literals contain no comment markers and no
    whitespace (the synthetic-corpus regime), the lexer and the regex twin
    agree — the property that keeps the regex-twin oracle meaningful."""
    from biblib_spark.codecorpus import clone_text, n_clones

    seed = 13
    checked = 0
    for o in range(120):
        for k in range(n_clones(o, seed)):
            lang, content = clone_text(o, k, seed)
            lex = normalize_code_lexed(content, lang)
            rex = normalize_code_py(content)
            if lang == "python" and "//" in content.replace("// ", ""):
                continue  # regex twin eats floor division; lexer is right
            # compare only when literals are marker/space-free
            lits = re.findall(r'"[^"\n]*"|\'[^\'\n]*\'', content)
            if any(("#" in s or "//" in s or " " in s[1:-1]) for s in lits):
                continue
            assert lex == rex, (lang, o, k)
            checked += 1
    assert checked > 100


def test_unterminated_string_falls_through_as_code():
    # documented limit: no crash, no infinite loop; the dangling quote stays
    out = normalize_code_lexed('x = "unterminated\ny = 1 // c\n', "java")
    assert "y = 1" in out
    assert out.count('"') == 1


@pytest.mark.parametrize("lang", ["python", "java", "javascript", "go"])
def test_idempotent(lang):
    src = 'a = "s # x // y" // c\n# d\n  b  =  2\n'
    once = normalize_code_lexed(src, lang)
    assert normalize_code_lexed(once, lang) == once

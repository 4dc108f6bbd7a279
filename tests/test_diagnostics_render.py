"""Plain-text diagnostic rendering (sources/diagnostics.py) — the display
analog of the reference's ariadne ``to_diagnostic`` (src/diagnostics.rs:41-108):
placement priority span > line > whole-file, source line + caret underline."""

from __future__ import annotations

from biblib_spark.sources.diagnostics import render_diagnostic


def test_span_placement():
    src = "TY  - JOUR\nAU  - Smith, John\nER  -\n"
    # span over "AU" on line 2
    out = render_diagnostic(
        "input.ris", src, "unexpected tag", "bad_tag", line=None, span=(11, 13)
    )
    assert "error [bad_tag]: unexpected tag" in out
    assert "--> input.ris:2:1" in out
    assert "2 | AU  - Smith, John" in out
    caret_line = out.splitlines()[-1]
    assert caret_line.strip().startswith("| ^^") or "^^" in caret_line


def test_line_placement_underlines_whole_line():
    src = "line one\nline two\nline three"
    out = render_diagnostic("f.txt", src, "bad line", None, line=2, span=None)
    assert "--> f.txt:2:1" in out
    assert "2 | line two" in out
    assert "^" * len("line two") in out
    assert "[" not in out.splitlines()[0]  # no kind -> no bracket


def test_whole_file_fallback_and_empty_source():
    out = render_diagnostic("f", "abc", "broken", "k", line=None, span=None)
    assert "--> f:1:1" in out
    out2 = render_diagnostic("f", "", "broken", "k", line=None, span=None)
    assert "--> f:1:1" in out2  # must not raise on empty source


def test_span_clamped_to_source():
    out = render_diagnostic("f", "ab", "x", None, line=None, span=(50, 60))
    assert "--> f:1:3" in out or "--> f:1:" in out  # clamped, no crash


def test_render_quarantine_spark(spark):
    from biblib_spark.sources.diagnostics import render_quarantine
    from biblib_spark.sources.parse import parse_corpus_quarantine

    bad_ris = "TY  - JOUR\nAU  - Smith, John\nER  -\n"
    corpus = spark.createDataFrame(
        [(0, "r", "refs/bad.ris", "c", "RIS", bad_ris)],
        schema=(
            "row_id long, repo string, path string, commit string,"
            " lang string, content string"
        ),
    )
    q = parse_corpus_quarantine(corpus)
    rendered = render_quarantine(q, corpus).collect()
    assert len(rendered) == 1
    d = rendered[0].diagnostic
    assert "error [missing_value]" in d
    assert "refs/bad.ris:1:" in d  # error_line == 1 (from the parser)
    assert "TY  - JOUR" in d
    assert "^" in d

"""Pretty diagnostic rendering for quarantine rows.

The reference renders ``ParseError`` values as rich terminal reports with
source context, an underline at the error span, and a label message
(reference src/diagnostics.rs:41-92, ariadne-backed, feature-gated).  The
error DATA (line, byte span, kind, message) has been carried by the
quarantine schema since round 1 (schema.py DIAGNOSTICS_SCHEMA); this module
adds the human-facing rendering:

- :func:`to_diagnostic` — one error -> one report string, the analog of
  ``ParseError::to_diagnostic(filename, source)``.  Span placement priority
  matches ``primary_byte_range`` (diagnostics.rs:73-92): explicit span >
  line-derived range > whole-file fallback (offset 0).
- :func:`render_diagnostics` — the Spark shape: quarantine rows joined back
  to their source payloads, rendered per-row inside an Arrow-batched pandas
  UDF.  Rendering is embarrassingly parallel and the report column is only
  as large as the error set, so this stays distributed; callers ``.limit()``
  before ``.collect()`` for terminal display.

Spans are BYTE offsets into the UTF-8 encoding of the source (the reference
counts Rust ``&str`` bytes, src/error.rs:15-33); the renderer converts them
to character positions before slicing Python strings.
"""

from __future__ import annotations

from typing import Any

_RED = "\x1b[31m"
_DIM = "\x1b[2m"
_RESET = "\x1b[0m"


def _byte_to_char(source: str, byte_off: int) -> int:
    """Char index for a UTF-8 byte offset (clamped, never mid-codepoint)."""
    raw = source.encode("utf-8")
    byte_off = max(0, min(byte_off, len(raw)))
    return len(raw[:byte_off].decode("utf-8", errors="ignore"))


def _line_char_range(source: str, line: int) -> tuple[int, int]:
    """(start, end) char offsets of 1-based ``line`` (diagnostics.rs:77-88:
    sum of preceding line lengths + 1 per newline; missing line -> empty
    range at that offset)."""
    start = 0
    for _ in range(max(0, line - 1)):
        nl = source.find("\n", start)
        if nl < 0:
            return len(source), len(source)
        start = nl + 1
    end = source.find("\n", start)
    if end < 0:
        end = len(source)
    return start, end


def _primary_char_range(
    source: str,
    line: int | None,
    span: tuple[int, int] | None,
) -> tuple[int, int]:
    """Report range in CHAR offsets; priority span > line > 0..0
    (reference primary_byte_range, diagnostics.rs:73-92)."""
    if span is not None:
        return _byte_to_char(source, span[0]), _byte_to_char(source, span[1])
    if line is not None:
        return _line_char_range(source, line)
    return 0, 0


def to_diagnostic(
    msg: str,
    filename: str,
    source: str,
    *,
    line: int | None = None,
    span: tuple[int, int] | None = None,
    kind: str | None = None,
    color: bool = False,
) -> str:
    """Render one parse error as an ariadne-style report string.

    Mirrors ``ParseError::to_diagnostic`` (reference diagnostics.rs:41-66):
    a header with the display message, a ``filename:line:col`` origin, the
    source line(s) the range touches with an underline, and the message as
    the label.  ``color=True`` adds ANSI codes (the reference emits them
    when the terminal supports them; plain text here is the default since
    Spark rows usually land in logs/files).
    """
    source = source if isinstance(source, str) else ""
    start, end = _primary_char_range(source, line, span)
    start = max(0, min(start, len(source)))
    end = max(start, min(end, len(source)))

    # line/col (1-based) of the range start
    line_no = source.count("\n", 0, start) + 1
    line_start = source.rfind("\n", 0, start) + 1
    col_no = start - line_start + 1

    red = _RED if color else ""
    dim = _DIM if color else ""
    reset = _RESET if color else ""

    header = f"{red}Error:{reset} {msg}"
    if kind:
        header = f"{red}Error [{kind}]:{reset} {msg}"
    out = [header, f"   {dim}╭─[{reset} {filename}:{line_no}:{col_no} {dim}]{reset}"]
    out.append(f"   {dim}│{reset}")

    # every source line the range touches (cap the context like ariadne
    # does for pathological spans)
    lines: list[tuple[int, int, int]] = []  # (line_no, char_start, char_end)
    ls, cursor = line_start, line_no
    while True:
        le = source.find("\n", ls)
        if le < 0:
            le = len(source)
        lines.append((cursor, ls, le))
        if le >= end or le >= len(source) or len(lines) >= 8:
            break
        ls, cursor = le + 1, cursor + 1

    gutter = len(str(lines[-1][0]))
    for no, ls, le in lines:
        text = source[ls:le]
        out.append(f" {no:>{gutter}} {dim}│{reset} {text}")
        # underline the in-line portion of the range
        u_from = max(start, ls) - ls
        u_to = min(max(end, start + 1), le) - ls
        if u_to > u_from or (ls <= start <= le):
            width = max(1, u_to - u_from)
            pad = " " * u_from
            bar = "┬" + "─" * (width - 1)
            out.append(f" {' ' * gutter} {dim}│{reset} {pad}{red}{bar}{reset}")
            out.append(
                f" {' ' * gutter} {dim}│{reset} {pad}"
                f"{red}╰──{reset} {msg}"
            )
            # label only once, at the first touched line (ariadne attaches
            # one label per Label::new; ours has exactly one)
            start, end = len(source) + 1, len(source) + 1
    out.append(f"{dim}───╯{reset}")
    return "\n".join(out)


def diagnostic_from_row(
    row: dict[str, Any] | Any,
    filename: str,
    source: str,
    *,
    color: bool = False,
) -> str:
    """Render a quarantine row (schema.py DIAGNOSTICS_SCHEMA error fields)."""
    get = row.get if isinstance(row, dict) else lambda k, d=None: getattr(row, k, d)
    span_v = get("error_span")
    span = None
    if span_v is not None:
        s = span_v.get("start") if isinstance(span_v, dict) else span_v["start"]
        e = span_v.get("end") if isinstance(span_v, dict) else span_v["end"]
        if s is not None and e is not None:
            span = (int(s), int(e))
    return to_diagnostic(
        get("error_msg") or "parse error",
        filename,
        source,
        line=int(get("error_line")) if get("error_line") is not None else None,
        span=span,
        kind=get("error_kind"),
        color=color,
    )


def render_diagnostics(errors, corpus, *, filename_col: str | None = None,
                       color: bool = False):
    """Quarantine rows -> one ``diagnostic`` report string per error.

    ``errors`` is the error side of ``parse_with_diagnostics``/
    ``split_diagnostics`` (carries row_id + error fields); ``corpus`` is the
    input table (row_id, content[, filename]).  The join restores the source
    text each report needs; rendering runs in an Arrow-batched pandas UDF —
    no driver loop, report volume is proportional to the ERROR count, not
    the corpus.  ``filename_col`` names a corpus column to use as the report
    origin label; default labels rows ``payload:<row_id>``.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    cols = ["row_id", "content"] + ([filename_col] if filename_col else [])
    joined = errors.join(corpus.select(*cols), "row_id", "left")

    # no type hints: the UDF takes 8 Series -> Series, declared via the
    # returnType argument (string annotations from ``__future__`` aren't
    # resolvable for function-local ``pd``)
    def _render_fn(row_id, content, fname, line, span_start, span_end,
                   kind, msg):
        out = []
        for rid, src, fn, ln, ss, se, kd, ms in zip(
            row_id, content, fname, line, span_start, span_end, kind, msg
        ):
            span = (
                (int(ss), int(se))
                if ss is not None and not pd.isna(ss)
                and se is not None and not pd.isna(se)
                else None
            )
            out.append(to_diagnostic(
                ms if isinstance(ms, str) and ms else "parse error",
                fn if isinstance(fn, str) and fn else f"payload:{rid}",
                src if isinstance(src, str) else "",
                line=int(ln) if ln is not None and not pd.isna(ln) else None,
                span=span,
                kind=kd if isinstance(kd, str) else None,
                color=color,
            ))
        return pd.Series(out)

    _render = pandas_udf(_render_fn, "string")

    fname_col = (
        F.col(filename_col) if filename_col else F.lit(None).cast("string")
    )
    return joined.withColumn(
        "diagnostic",
        _render(
            F.col("row_id"), F.col("content"), fname_col,
            F.col("error_line"), F.col("error_span.start"),
            F.col("error_span.end"), F.col("error_kind"), F.col("error_msg"),
        ),
    ).drop("content")

"""Human-readable diagnostic rendering for quarantine rows.

Plain-text analog of the reference's ariadne-backed ``to_diagnostic``
(reference src/diagnostics.rs:41-108): a header with the error message, a
``--> file:line:col`` locus, and the offending source line with a caret
underline. Placement priority matches the reference exactly — explicit span
> line-derived range > whole-file fallback (diagnostics.rs:71-91). No ANSI
codes: the reference itself documents piping through strip-ansi for plain
text, so plain text IS the stable rendering contract.

The error *data* (line/span/kind/msg) is produced by the parse kernels
(sources/parse.py); this module is the display path, executed only over the
quarantine slice (a tiny fraction of rows), batched through one pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _line_starts(source: str) -> list[int]:
    starts = [0]
    for i, ch in enumerate(source):
        if ch == "\n":
            starts.append(i + 1)
    return starts


def _locate(source: str, line: int | None, span: tuple | None) -> tuple[int, int, int]:
    """(line_no_1based, col_1based, underline_len) via the reference's
    priority: span > line > whole-file (offset 0)."""
    starts = _line_starts(source)
    if span is not None:
        s, e = span
        s = max(0, min(int(s), len(source)))
        e = max(s, min(int(e), len(source)))
        ln = 1
        for i, st in enumerate(starts):
            if st <= s:
                ln = i + 1
            else:
                break
        col = s - starts[ln - 1] + 1
        line_end = source.find("\n", starts[ln - 1])
        if line_end == -1:
            line_end = len(source)
        return ln, col, max(1, min(e, line_end) - s)
    if line is not None and line >= 1:
        ln = min(int(line), len(starts))
        line_end = source.find("\n", starts[ln - 1])
        if line_end == -1:
            line_end = len(source)
        return ln, 1, max(1, line_end - starts[ln - 1])
    return 1, 1, 1


def render_diagnostic(
    filename: str,
    source: str,
    error_msg: str,
    error_kind: str | None = None,
    line: int | None = None,
    span: tuple | None = None,
) -> str:
    """One quarantine row -> a plain-text diagnostic block."""
    source = source if isinstance(source, str) else ""
    ln, col, width = _locate(source, line, span)
    lines = source.split("\n")
    src_line = lines[ln - 1] if 0 < ln <= len(lines) else ""
    gutter = len(str(ln))
    kind = f" [{error_kind}]" if error_kind else ""
    pad = " " * gutter
    caret_pad = " " * (col - 1)
    carets = "^" * max(1, min(width, max(1, len(src_line) - col + 1)))
    return (
        f"error{kind}: {error_msg}\n"
        f"{pad}--> {filename}:{ln}:{col}\n"
        f"{pad} |\n"
        f"{ln} | {src_line}\n"
        f"{pad} | {caret_pad}{carets} {error_msg}"
    )


def render_quarantine(quarantine: DataFrame, corpus: DataFrame) -> DataFrame:
    """Quarantine rows + corpus -> (content_sha, format, diagnostic).

    Joins the error rows back to their payload text on ``content_sha``
    (broadcast the quarantine side when it is small — errors are a tiny
    fraction of a healthy corpus, so Catalyst's AQE usually picks that
    automatically) and renders each diagnostic in one Arrow-batched pass.
    The filename label is ``<path>`` when the corpus carries one, else the
    content sha.
    """

    @pandas_udf(StringType())
    def _render(
        fname: pd.Series,
        content: pd.Series,
        msg: pd.Series,
        kind: pd.Series,
        line: pd.Series,
        s_start: pd.Series,
        s_end: pd.Series,
    ) -> pd.Series:
        out = []
        for f, c, m, k, ln, ss, se in zip(
            fname, content, msg, kind, line, s_start, s_end
        ):
            span = (
                (int(ss), int(se))
                if ss is not None and not pd.isna(ss)
                else None
            )
            out.append(
                render_diagnostic(
                    f if isinstance(f, str) else "<payload>",
                    c,
                    m if isinstance(m, str) else "",
                    k if isinstance(k, str) else None,
                    int(ln) if ln is not None and not pd.isna(ln) else None,
                    span,
                )
            )
        return pd.Series(out)

    src_cols = ["content"]
    fname_col = (
        F.col("path") if "path" in corpus.columns else F.col("q_sha")
    )
    if "path" in corpus.columns:
        src_cols.append("path")
    payloads = corpus.withColumn(
        "q_sha", F.sha2(F.col("content"), 256)
    ).select("q_sha", *src_cols)
    joined = quarantine.join(
        payloads, quarantine["content_sha"] == payloads["q_sha"]
    )
    return joined.select(
        "content_sha",
        "format",
        _render(
            fname_col,
            F.col("content"),
            F.col("error_msg"),
            F.col("error_kind"),
            F.col("error_line"),
            F.col("error_span.start"),
            F.col("error_span.end"),
        ).alias("diagnostic"),
    )

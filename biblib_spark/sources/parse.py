"""The parse stage: corpus rows -> (parsed citation rows, quarantine rows).

Spark shape (SURVEY.md §3.1): one projection computes ``content_sha`` and the
detected ``format``; one ``mapInPandas`` runs the per-format Python kernels
over Arrow batches and emits already-exploded citation rows with a
``record_idx`` that preserves per-payload record order. Parsing is
embarrassingly parallel per content row — no shuffle in this stage; the only
JVM<->Python boundary is the Arrow batch transfer.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biblib_spark.kernels import detect
from biblib_spark.kernels.bib import parse_bib
from biblib_spark.kernels.csvfmt import parse_csv, parse_ictrp_csv
from biblib_spark.kernels.endnote_xml import parse_endnote_xml
from biblib_spark.kernels.enw import parse_enw
from biblib_spark.kernels.ictrp_xml import parse_ictrp_xml
from biblib_spark.kernels.pubmed import parse_pubmed
from biblib_spark.kernels.ris import parse_ris
from biblib_spark.schema import DIAGNOSTICS_SCHEMA, PARSED_SCHEMA, QUARANTINE_SCHEMA

# Parser registry: format label -> kernel returning (citations, errors).
# Formats land here as their kernels are implemented (SURVEY.md §7.2).
# Generic CSV is registered but never auto-detected (lib.rs:468) — it only
# runs when a corpus row's format column is explicitly "CSV".
PARSERS: dict[str, Callable[[str], tuple[list[dict], list[dict]]]] = {
    detect.FMT_RIS: parse_ris,
    detect.FMT_PUBMED: parse_pubmed,
    detect.FMT_ENW: parse_enw,
    detect.FMT_ICTRP_CSV: parse_ictrp_csv,
    detect.FMT_CSV: parse_csv,
    detect.FMT_ENDNOTE_XML: parse_endnote_xml,
    detect.FMT_ICTRP_XML: parse_ictrp_xml,
    detect.FMT_BIB: parse_bib,
}


def register_parser(
    fmt: str, fn: Callable[[str], tuple[list[dict], list[dict]]]
) -> None:
    PARSERS[fmt] = fn


def with_ingest_columns(corpus: DataFrame) -> DataFrame:
    """Add ``content_sha`` (the per-row invariant vs the reference,
    BASELINE.json input_hint) and the detected ``format``.

    Format detection is a cheap prefix/contains check — done in the Python
    kernel during parse; here we only add the sha (JVM-side, codegen).
    """
    return corpus.withColumn("content_sha", F.sha2(F.col("content"), 256))


def _parse_partition(
    batches: Iterator[pd.DataFrame], quarantine: bool
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list[Any]] = {
            "content_sha": [],
            "row_id": [],
            "record_idx": [],
            "format": [],
        }
        recs: list[Any] = []
        for sha, row_id, content in zip(
            pdf["content_sha"], pdf["row_id"], pdf["content"]
        ):
            text = content if isinstance(content, str) else ""
            fmt = detect.detect_format(text)
            parser = PARSERS.get(fmt)
            if parser is None:
                if quarantine and fmt == detect.FMT_UNKNOWN:
                    out["content_sha"].append(sha)
                    out["row_id"].append(row_id)
                    out["record_idx"].append(0)
                    out["format"].append(fmt)
                    recs.append(
                        {
                            "error_line": None,
                            "error_span": None,
                            "error_kind": "unknown_format",
                            "error_msg": "Unknown or unsupported citation format",
                        }
                    )
                continue
            citations, errors = parser(text)
            if quarantine:
                for err in errors:
                    out["content_sha"].append(sha)
                    out["row_id"].append(row_id)
                    out["record_idx"].append(0)
                    out["format"].append(fmt)
                    recs.append(
                        {
                            "error_line": err.get("error_line"),
                            "error_span": err.get("error_span"),
                            "error_kind": err.get("error_kind"),
                            "error_msg": err.get("error_msg"),
                        }
                    )
            else:
                for idx, citation in enumerate(citations):
                    out["content_sha"].append(sha)
                    out["row_id"].append(row_id)
                    out["record_idx"].append(idx)
                    out["format"].append(fmt)
                    recs.append(citation)
        result = pd.DataFrame(out)
        if quarantine:
            result["error_line"] = pd.Series(
                [r["error_line"] for r in recs], dtype="object"
            )
            result["error_span"] = pd.Series(
                [r["error_span"] for r in recs], dtype="object"
            )
            result["error_kind"] = [r["error_kind"] for r in recs]
            result["error_msg"] = [r["error_msg"] for r in recs]
            result = result[
                [
                    "content_sha",
                    "row_id",
                    "format",
                    "error_line",
                    "error_span",
                    "error_kind",
                    "error_msg",
                ]
            ]
        else:
            result["citation"] = pd.Series(recs, dtype="object")
        yield result


def _diag_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One parse per payload emitting BOTH citation and error rows
    (reference parse_with_diagnostics, src/diagnostics.rs:111-119)."""
    cols = [f.name for f in DIAGNOSTICS_SCHEMA.fields]
    for pdf in batches:
        out: dict[str, list[Any]] = {c: [] for c in cols}

        def emit(sha, row_id, kind, idx, fmt, citation, err):
            out["content_sha"].append(sha)
            out["row_id"].append(row_id)
            out["kind"].append(kind)
            out["record_idx"].append(idx)
            out["format"].append(fmt)
            out["citation"].append(citation)
            out["error_line"].append(err.get("error_line") if err else None)
            out["error_span"].append(err.get("error_span") if err else None)
            out["error_kind"].append(err.get("error_kind") if err else None)
            out["error_msg"].append(err.get("error_msg") if err else None)

        for sha, row_id, content in zip(
            pdf["content_sha"], pdf["row_id"], pdf["content"]
        ):
            text = content if isinstance(content, str) else ""
            fmt = detect.detect_format(text)
            parser = PARSERS.get(fmt)
            if parser is None:
                emit(
                    sha,
                    row_id,
                    "error",
                    None,
                    fmt,
                    None,
                    {
                        "error_kind": "unknown_format",
                        "error_msg": "Unknown or unsupported citation format",
                    },
                )
                continue
            citations, errors = parser(text)
            for idx, citation in enumerate(citations):
                emit(sha, row_id, "citation", idx, fmt, citation, None)
            for err in errors:
                emit(sha, row_id, "error", None, fmt, None, err)
        result = pd.DataFrame({c: pd.Series(out[c], dtype="object") for c in cols})
        yield result


def parse_with_diagnostics(corpus: DataFrame) -> DataFrame:
    """Corpus -> union of citation and error rows in ONE parse pass
    (DIAGNOSTICS_SCHEMA). The reference's ``parse_with_diagnostics`` returns
    (citations, errors) per payload; here both live in one DataFrame keyed by
    ``kind`` so a single scan (or checkpointed stage) serves the parsed view
    AND the quarantine view — no second parse of 100 TB of payloads."""
    ingested = with_ingest_columns(corpus).select("content_sha", "row_id", "content")
    return ingested.mapInPandas(_diag_partition, schema=DIAGNOSTICS_SCHEMA)


def split_diagnostics(diag: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Diagnostics union -> (parsed PARSED_SCHEMA view, quarantine view)."""
    parsed = diag.filter(F.col("kind") == "citation").select(
        "content_sha",
        "row_id",
        F.col("record_idx").cast("int").alias("record_idx"),
        "format",
        "citation",
    )
    quarantine = diag.filter(F.col("kind") == "error").select(
        "content_sha",
        "row_id",
        "format",
        "error_line",
        "error_span",
        "error_kind",
        "error_msg",
    )
    return parsed, quarantine


def parse_corpus(corpus: DataFrame) -> DataFrame:
    """Corpus -> parsed citation rows (PARSED_SCHEMA)."""
    ingested = with_ingest_columns(corpus).select("content_sha", "row_id", "content")
    return ingested.mapInPandas(
        lambda it: _parse_partition(it, quarantine=False), schema=PARSED_SCHEMA
    )


def parse_corpus_quarantine(corpus: DataFrame) -> DataFrame:
    """Corpus -> quarantine rows (QUARANTINE_SCHEMA) for records that failed.

    Runs the same kernels; at 100 TB you'd compute both outputs in one pass
    and fork the writer — kept as two scans here for plan simplicity, each
    scan prunes to (content_sha, row_id, content) only.
    """
    ingested = with_ingest_columns(corpus).select("content_sha", "row_id", "content")
    return ingested.mapInPandas(
        lambda it: _parse_partition(it, quarantine=True), schema=QUARANTINE_SCHEMA
    )

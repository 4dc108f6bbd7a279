"""Public API facade parity with the reference entry points."""

from __future__ import annotations

import pytest

from biblib_spark import api

RIS = (
    "TY  - JOUR\nTI  - Renal outcomes\nJF  - J Renal\nVL  - 12\n"
    "PY  - 2001\nDO  - 10.1000/x.1\nER  -\n"
)


def test_detect_and_parse_roundtrip():
    assert api.detect_format(RIS) == "RIS"
    cits = api.detect_and_parse(RIS)
    assert len(cits) == 1
    assert cits[0]["title"] == "Renal outcomes"
    assert cits[0]["doi"] == "10.1000/x.1"
    assert api.parse(RIS, format="RIS") == cits


def test_parse_with_diagnostics_returns_both():
    cits, errors = api.parse_with_diagnostics(RIS)
    assert len(cits) == 1 and errors == []


def test_unknown_format_raises():
    with pytest.raises(ValueError, match="unknown or unsupported"):
        api.parse("<<<definitely not a citation>>>")


def test_find_duplicates_is_dedupe_records(spark):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("rid", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("journal", T.StringType()),
            T.StructField("journal_abbr", T.StringType()),
            T.StructField("volume", T.StringType()),
            T.StructField("pages", T.StringType()),
            T.StructField("issn", T.ArrayType(T.StringType())),
            T.StructField("doi", T.StringType()),
            T.StructField("year", T.IntegerType()),
            T.StructField("abstract_text", T.StringType()),
        ]
    )
    recs = [
        {"rid": 1, "title": "Renal outcomes", "journal": "J Renal",
         "volume": "12", "doi": "10.1/a", "issn": [], "year": 2001,
         "source": None, "journal_abbr": None, "pages": None,
         "abstract_text": None},
        {"rid": 2, "title": "Renal outcomes!", "journal": "J Renal",
         "volume": "12", "doi": "10.1/a", "issn": [], "year": 2001,
         "source": None, "journal_abbr": None, "pages": None,
         "abstract_text": None},
    ]
    out = api.find_duplicates(spark.createDataFrame(recs, schema)).collect()
    assert len({r.cluster_id for r in out}) == 1

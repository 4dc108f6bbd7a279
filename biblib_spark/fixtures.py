"""Deterministic oracle fixture for driver-contract citation queries.

The driver's correctness gate compares each ``queries()`` entry against an
ANSI-SQL DuckDB oracle. The citation matcher's operators (verify predicate
M4-M8, identity tiers C1, year blocking M1, election M10, connected
components C6) are SQL-expressible *given a table of preprocessed features* —
so this module materializes one: the synthetic corpus is parsed and
normalized with the SAME Python kernels the Spark pipeline uses (pure
Python, no Spark needed), and written to small parquet files that BOTH the
Spark query and the DuckDB oracle read. The oracle then re-implements the
operator itself (jaro thresholds, null semantics, tier joins, election
windows, recursive-CTE components) independently in SQL.

Built lazily at first use (atomic rename, so concurrent builders can't
corrupt it); content is a pure function of (SEED, N_PAYLOADS, RPP).

Tables:
- features.parquet  — one row per parsed citation: rid, source, identity
  fields (doi/pmid/accession_number), year, pages, abstract marker, the
  N1-N5 normalized fields, year_key, and the ground-truth work_id (never
  consulted by matcher queries; used to build the clusters fixture).
- pairs.parquet     — every within-year-block pair (a < b): the candidate
  set the verify-predicate oracle runs on (M1 blocking: comparisons never
  cross year blocks, reference src/dedupe.rs:403-500).
- clusters.parquet  — rid, cluster_id (= min rid of the work group), source,
  abstract_text, doi: input for the election oracle (src/dedupe.rs:507-555).
"""

from __future__ import annotations

import os
import shutil

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO_ROOT, ".oracle_fixture_v3")
FEATURES = os.path.join(FIXTURE_DIR, "features.parquet")
PAIRS = os.path.join(FIXTURE_DIR, "pairs.parquet")
CLUSTERS = os.path.join(FIXTURE_DIR, "clusters.parquet")

N_PAYLOADS = 120
RPP = 6
SEED = 7
SHIFT = 1 << 20  # must match records_from_parsed's record_idx_bits


def _build_frames():
    import pandas as pd

    from biblib_spark.corpus import (
        SLOTS_PER_WORK,
        n_variants,
        payload_format,
        payload_text,
    )
    from biblib_spark.kernels.norm import (
        format_issn,
        format_journal_name,
        normalize_title,
        normalize_volume,
    )
    from biblib_spark.sources.parse import PARSERS

    rows = []
    for p in range(N_PAYLOADS):
        fmt = payload_format(p)
        citations, errors = PARSERS[fmt](payload_text(p, RPP, SEED))
        assert not errors
        works = [
            slot // SLOTS_PER_WORK
            for slot in range(p * RPP, (p + 1) * RPP)
            if slot % SLOTS_PER_WORK < n_variants(slot // SLOTS_PER_WORK, SEED)
        ]
        assert len(works) == len(citations)
        for idx, (c, w) in enumerate(zip(citations, works)):
            nt = normalize_title(c["title"] or "") or ""
            year = c["date"]["year"] if c["date"] else None
            rows.append(
                {
                    "rid": p * SHIFT + idx,
                    "source": fmt,
                    "doi": c["doi"],
                    "pmid": c["pmid"],
                    "accession_number": c["accession_number"],
                    "year": year,
                    "pages": c["pages"],
                    "abstract_text": "x" if c["abstract_text"] is not None else None,
                    "norm_title": nt,
                    "norm_journal": (
                        format_journal_name(c["journal"])
                        if c["journal"] is not None
                        else None
                    ),
                    "norm_journal_abbr": (
                        format_journal_name(c["journal_abbr"])
                        if c["journal_abbr"] is not None
                        else None
                    ),
                    "norm_volume": (
                        normalize_volume(c["volume"]) if c["volume"] is not None else ""
                    ),
                    "norm_issn": [
                        f
                        for f in (format_issn(v) for v in c["issn"] or [])
                        if f is not None
                    ],
                    "year_key": year if year is not None else 0,
                    "work_id": w,
                }
            )

    # C4 containment rows: head-truncated copies whose jaro to the source
    # falls below every reference threshold — only the substring arm links
    # them. Same journal/volume/pages/year corroboration; no identity fields.
    base = [r for r in rows if len(r["norm_title"]) >= 36]
    stride = max(1, len(base) // 8)
    for i, src in enumerate(base[::stride][:8]):
        r = dict(src)
        r["rid"] = (N_PAYLOADS + 1 + i) * SHIFT
        r["norm_title"] = src["norm_title"][12:]
        r["doi"] = None
        r["pmid"] = None
        r["accession_number"] = None
        rows.append(r)

    feat = pd.DataFrame(rows)
    feat["year"] = feat["year"].astype("Int32")
    feat["year_key"] = feat["year_key"].astype("int32")

    # M1 blocking: the oracle pair set is ALL within-year pairs — exactly the
    # comparison set of the reference's blocked O(sum n_y^2) loop
    pair_rows = []
    for _, grp in feat.groupby("year_key"):
        rids = sorted(grp["rid"].tolist())
        for i, a in enumerate(rids):
            for b in rids[i + 1 :]:
                pair_rows.append({"a": a, "b": b})
    pairs = pd.DataFrame(pair_rows)

    clusters = feat.assign(
        cluster_id=feat.groupby("work_id")["rid"].transform("min")
    )[["rid", "cluster_id", "source", "abstract_text", "doi"]]
    return feat, pairs, clusters


def ensure_oracle_fixture() -> str:
    """Build the fixture parquet files if missing; returns FIXTURE_DIR."""
    if os.path.isdir(FIXTURE_DIR):
        return FIXTURE_DIR
    import pyarrow as pa
    import pyarrow.parquet as pq

    feat, pairs, clusters = _build_frames()
    # explicit arrow schemas: all-null columns (e.g. norm_journal_abbr on this
    # corpus) must still land as string, not pandas-inferred int
    feat_schema = pa.schema(
        [
            ("rid", pa.int64()),
            ("source", pa.string()),
            ("doi", pa.string()),
            ("pmid", pa.string()),
            ("accession_number", pa.string()),
            ("year", pa.int32()),
            ("pages", pa.string()),
            ("abstract_text", pa.string()),
            ("norm_title", pa.string()),
            ("norm_journal", pa.string()),
            ("norm_journal_abbr", pa.string()),
            ("norm_volume", pa.string()),
            ("norm_issn", pa.list_(pa.string())),
            ("year_key", pa.int32()),
            ("work_id", pa.int64()),
        ]
    )
    clusters_schema = pa.schema(
        [
            ("rid", pa.int64()),
            ("cluster_id", pa.int64()),
            ("source", pa.string()),
            ("abstract_text", pa.string()),
            ("doi", pa.string()),
        ]
    )
    tmp = f"{FIXTURE_DIR}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(feat, schema=feat_schema, preserve_index=False),
        os.path.join(tmp, "features.parquet"),
    )
    pairs.to_parquet(os.path.join(tmp, "pairs.parquet"), index=False)
    pq.write_table(
        pa.Table.from_pandas(clusters, schema=clusters_schema, preserve_index=False),
        os.path.join(tmp, "clusters.parquet"),
    )
    try:
        os.rename(tmp, FIXTURE_DIR)
    except OSError:  # lost the race; the other builder's copy is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return FIXTURE_DIR

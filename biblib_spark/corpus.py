"""Deterministic synthetic citation corpus (north_rule input shape).

Generates an input table of exactly the mandated shape
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint) plus a
``row_id`` payload index. Generation is a pure function of (seed, payload
index), so it runs distributed via ``spark.range(...).mapInPandas`` with no
driver-side materialization — the same generator scales from test fixtures to
bench corpora.

Duplicate structure: records derive from "work" entities; work ``w`` has
1..4 variants spread across payloads, perturbed so the reference predicate
(/root/reference/src/dedupe.rs:625-648) classifies variant pairs as
duplicates deterministically:
- v0 canonical (DOI + journal + volume + pages + abstract)
- v1 title punctuation/case tweaks, same DOI/journal  -> DOI arm 1
- v2 DOI dropped, same title/volume/journal           -> no-DOI arm (jw>=0.93)
- v3 DOI kept, journal dropped, same volume/pages     -> DOI arm 2
The ground-truth work id rides in the RIS ``AN`` tag (accession_number),
which the matcher never consults.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from biblib_spark.schema import CORPUS_SCHEMA

SLOTS_PER_WORK = 4  # slot k of work w exists iff k < n_variants(w)

# A diverse deterministic vocabulary (~3.4k words). Real titles are lexically
# diverse; a tiny vocabulary makes unrelated titles share most character
# shingles, overloading LSH buckets with false candidates (superlinear pair
# blowup observed at 500k records with a 38-word vocabulary).
_DOMAIN = (
    "analysis treatment randomized clinical outcomes cardiovascular neural"
    " cognitive pediatric chronic acute renal hepatic pulmonary vascular"
    " genomic protein receptor inhibitor antibody infection resistance"
    " screening imaging biomarker cohort longitudinal placebo efficacy"
    " safety prevalence incidence mortality survival regression learning"
    " network model estimation"
).split()
_SYL = [c + v for c in "bcdfghklmnprstvz" for v in "aeiou"]  # 80 syllables
_WORDS = _DOMAIN + [
    _SYL[i % 80] + _SYL[(i // 80) % 80] + _SYL[(i // 6400) % 80]
    for i in range(3400)
]

_JOURNALS = [
    f"Journal of {a.capitalize()} {b.capitalize()}"
    for a, b in zip(_WORDS[0:80:2], _WORDS[1:80:2])
]


def _h(seed: int, *parts: object) -> int:
    """Deterministic 64-bit hash of (seed, parts) — stable across workers."""
    key = f"{seed}|" + "|".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little")


def n_variants(w: int, seed: int) -> int:
    """1..4 variants; ~55% singletons keeps dup density realistic."""
    r = _h(seed, "nvar", w) % 100
    if r < 55:
        return 1
    if r < 80:
        return 2
    if r < 95:
        return 3
    return 4


#: planted mega-block profile (C7 skew stress): works whose hash falls under
#: ``frac`` share ONE year and ONE boilerplate title — the "mega-journal /
#: boilerplate title" hot key of the north_rule. DOIs stay per-work so the
#: stress lands on the similarity tiers' buckets, not the C1 identity tier.
MEGA_TITLE = (
    "Proceedings of the annual meeting abstracts supplement"
)
MEGA_YEAR = 2015


def _is_mega(w: int, seed: int, frac: float) -> bool:
    return frac > 0 and _h(seed, "mega", w) % 100_000 < int(frac * 100_000)


def _work_fields(w: int, seed: int, mega_frac: float = 0.0) -> dict:
    h = _h(seed, "work", w)
    nw = 5 + h % 5
    words = [_WORDS[_h(seed, "tw", w, i) % len(_WORDS)] for i in range(nw)]
    title = " ".join(words).capitalize()
    year = 1990 + _h(seed, "yr", w) % 35
    journal = _JOURNALS[_h(seed, "jr", w) % len(_JOURNALS)]
    volume = str(1 + _h(seed, "vol", w) % 90)
    p0 = 100 + _h(seed, "pg", w) % 800
    pages_sp, pages_ep = str(p0), str(p0 + 1 + _h(seed, "pl", w) % 12)
    doi = f"10.{1000 + w % 997}/synth.{w}"
    issn = f"{1000 + _h(seed, 'is1', w) % 9000:04d}-{_h(seed, 'is2', w) % 10000:04d}"
    n_auth = 1 + _h(seed, "na", w) % 3
    authors = [
        f"{_WORDS[_h(seed, 'au', w, i) % len(_WORDS)].capitalize()}, "
        f"{chr(65 + _h(seed, 'gi', w, i) % 26)}."
        for i in range(n_auth)
    ]
    if _is_mega(w, seed, mega_frac):
        title = MEGA_TITLE
        year = MEGA_YEAR
    return {
        "title": title,
        "year": year,
        "journal": journal,
        "volume": volume,
        "sp": pages_sp,
        "ep": pages_ep,
        "doi": doi,
        "issn": issn,
        "authors": authors,
    }


def _variant_fields(w: int, k: int, seed: int, mega_frac: float = 0.0) -> dict:
    """Apply the variant-k perturbations to work w's canonical fields."""
    f = dict(_work_fields(w, seed, mega_frac))
    if k == 1:
        f["title"] = f["title"].upper() + "."  # normalizes identically (N2)
        f["volume"] = None
    elif k == 2:
        f["title"] = f["title"] + "!"
        f["doi"] = None
    elif k == 3:
        f["journal"] = None
        f["issn"] = None
    if k % 2 == 0:
        # realistic payload mass: real exports carry multi-hundred-char
        # abstracts; sentence count/words are deterministic per (w, k)
        n_sent = 3 + _h(seed, "ns", w, k) % 4
        sentences = []
        for s in range(n_sent):
            nw = 9 + _h(seed, "sw", w, k, s) % 8
            words = [
                _WORDS[_h(seed, "aw", w, k, s, i) % len(_WORDS)] for i in range(nw)
            ]
            sentences.append(" ".join(words).capitalize() + ".")
        f["abstract"] = " ".join(sentences)
    else:
        f["abstract"] = None
    return f


def _ris_record(w: int, k: int, seed: int, mega_frac: float = 0.0) -> str:
    f = _variant_fields(w, k, seed, mega_frac)
    lines = ["TY  - JOUR", f"TI  - {f['title']}"]
    for a in f["authors"]:
        lines.append(f"AU  - {a}")
    if f["journal"]:
        lines.append(f"JF  - {f['journal']}")
    if f["issn"]:
        lines.append(f"SN  - {f['issn']}")
    if f["volume"]:
        lines.append(f"VL  - {f['volume']}")
    lines.append(f"SP  - {f['sp']}")
    lines.append(f"EP  - {f['ep']}")
    lines.append(f"PY  - {f['year']}")
    if f["doi"]:
        lines.append(f"DO  - {f['doi']}")
    if f["abstract"]:
        lines.append(f"AB  - {f['abstract']}")
    lines.append(f"AN  - WORK-{w}")  # ground truth; never consulted by matcher
    lines.append("ER  -")
    return "\n".join(lines)


def _pubmed_record(w: int, k: int, seed: int, mega_frac: float = 0.0) -> str:
    f = _variant_fields(w, k, seed, mega_frac)
    lines = [f"PMID- {90000000 + w * SLOTS_PER_WORK + k}", f"TI  - {f['title']}"]
    for a in f["authors"]:
        lines.append(f"FAU - {a}")
    if f["journal"]:
        lines.append(f"JT  - {f['journal']}")
    if f["issn"]:
        lines.append(f"IS  - {f['issn']}")
    if f["volume"]:
        lines.append(f"VI  - {f['volume']}")
    lines.append(f"PG  - {f['sp']}-{f['ep']}")
    lines.append(f"DP  - {f['year']}")
    if f["doi"]:
        lines.append(f"LID - {f['doi']} [doi]")
    if f["abstract"]:
        lines.append(f"AB  - {f['abstract']}")
    lines.append(f"SI  - WORK-{w}")  # ground truth (extra_fields only)
    return "\n".join(lines)


def payload_format(p: int) -> str:
    """Even payloads export RIS, odd payloads PubMed .nbib — variants of one
    work land in BOTH formats, so clusters span formats."""
    return "RIS" if p % 2 == 0 else "PubMed"


def payload_text(
    p: int, records_per_payload: int, seed: int, mega_frac: float = 0.0
) -> str:
    """Payload for index ``p`` — records are the existing slots in the global
    slot range [p*rpp, (p+1)*rpp), serialized in the payload's format."""
    fmt = payload_format(p)
    records = []
    for slot in range(p * records_per_payload, (p + 1) * records_per_payload):
        w, k = divmod(slot, SLOTS_PER_WORK)
        if k < n_variants(w, seed):
            records.append(
                _ris_record(w, k, seed, mega_frac)
                if fmt == "RIS"
                else _pubmed_record(w, k, seed, mega_frac)
            )
    return "\n\n".join(records) + ("\n" if records else "")


def _gen_partition(
    batches: Iterator[pd.DataFrame],
    records_per_payload: int,
    seed: int,
    mega_frac: float = 0.0,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for p in pdf["id"]:
            p = int(p)
            fmt = payload_format(p)
            ext = "ris" if fmt == "RIS" else "nbib"
            content = payload_text(p, records_per_payload, seed, mega_frac)
            commit = hashlib.sha256(f"c{seed}-{p}".encode()).hexdigest()[:40]
            rows.append(
                {
                    "row_id": p,
                    "repo": f"org{p % 97}/src{p % 1009}",
                    "path": f"refs/{ext}/{p}.{ext}",
                    "commit": commit,
                    "lang": fmt,
                    "content": content,
                }
            )
        yield pd.DataFrame(rows)


def make_corpus(
    spark: SparkSession,
    num_payloads: int,
    records_per_payload: int = 6,
    seed: int = 42,
    partitions: int | None = None,
    mega_frac: float = 0.0,
) -> DataFrame:
    """Distributed deterministic corpus of ``num_payloads`` RIS payloads.

    ``mega_frac`` > 0 plants the C7 skew stress: that fraction of works
    share one boilerplate title + one year (``MEGA_TITLE``/``MEGA_YEAR``),
    concentrating their records into a single similarity-tier hot bucket.
    """
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, num_payloads, numPartitions=partitions)
    return rng.mapInPandas(
        lambda it: _gen_partition(it, records_per_payload, seed, mega_frac),
        schema=CORPUS_SCHEMA,
    )

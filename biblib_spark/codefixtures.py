"""Deterministic oracle fixture for the source-code clone contract entries.

Same pattern as ``biblib_spark.fixtures`` / ``biblib_spark.docfixtures``:
the non-SQL-expressible inputs of the code-clone operators — the
identifier-canonicalized token stream (a Python tokenizer) and the MinHash
band keys / winnowed fingerprints derived from it — are materialized once,
pure-Python, with the SAME kernel functions the Spark pipeline uses. The
DuckDB oracle then re-implements every *operator* independently in SQL over
those fixtures (sha256/normalization from RAW content, star-capped bucket
self-joins, token-4-gram Jaccard / containment verify, recursive-CTE
connected components), while the Spark contract query runs the real
pipeline end-to-end from the raw file table.

Tables (all keyed by ``rid`` = corpus row_id):
- code_files.parquet — the raw input_hint table
  (row_id, repo, path, commit, lang, content)
- code_ctoks.parquet — (rid, lang, norm_hash, ctoks): md5 of the
  lexer-grade string-literal-safe normalization (kernels/codelex.py — the
  production type-1 key; a state machine, not SQL-expressible, so the
  oracle reads the kernel-built hash the same way it reads bands) plus the
  scope-local identifier-canonicalized token stream
  (codedup.canonical_tokens_py over the same normalization)
- code_bands.parquet — (rid, lang, bkey): banded MinHash LSH keys over the
  token-4-gram hash set at the contract config (192 perms, 48 bands of 4
  rows, seed 97), exploded
- code_wfps.parquet  — (rid, lang, fp): winnowed int64 fingerprints of the
  token-4-gram hash sequence (window 5, MOSS selection)

Bands and fingerprints are produced by the SAME batch kernel the Spark
feature UDF runs (codedup.code_feature_rows) — parity by construction, not
by a hand-maintained twin.

Content is a pure function of (SEED, N_ORIGINS); built lazily with an
atomic rename (concurrent builders produce identical bytes).
"""

from __future__ import annotations

import hashlib
import os
import shutil

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODE_FIXTURE_DIR = os.path.join(REPO_ROOT, ".oracle_fixture_code_v4")
CODE_FILES = os.path.join(CODE_FIXTURE_DIR, "code_files.parquet")
CODE_CTOKS = os.path.join(CODE_FIXTURE_DIR, "code_ctoks.parquet")
CODE_BANDS = os.path.join(CODE_FIXTURE_DIR, "code_bands.parquet")
CODE_WFPS = os.path.join(CODE_FIXTURE_DIR, "code_wfps.parquet")

N_ORIGINS = 250
SEED = 13


def _build(tmp: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biblib_spark.codecorpus import (
        SLOTS_PER_ORIGIN,
        clone_text,
        n_clones,
        _ident,
        _EXT,
    )
    from biblib_spark.operators.codedup import (
        code_feature_rows,
        lexed_norm_rows,
        norm_hash_py,
    )

    rows = []
    for o in range(N_ORIGINS):
        for k in range(n_clones(o, SEED)):
            rid = o * SLOTS_PER_ORIGIN + k
            lang, content = clone_text(o, k, SEED)
            rows.append(
                {
                    "row_id": rid,
                    "repo": f"org{o % 57}/repo{o % 503}",
                    "path": f"src/{_ident(SEED, 'dir', o)}/"
                    f"{_ident(SEED, 'fl', rid)}.{_EXT[lang]}",
                    "commit": hashlib.sha256(
                        f"cc{SEED}-{rid}".encode()
                    ).hexdigest()[:40],
                    "lang": lang,
                    "content": content,
                }
            )

    pq.write_table(
        pa.table(
            {
                "row_id": pa.array([r["row_id"] for r in rows], pa.int64()),
                "repo": pa.array([r["repo"] for r in rows], pa.string()),
                "path": pa.array([r["path"] for r in rows], pa.string()),
                "commit": pa.array([r["commit"] for r in rows], pa.string()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
                "content": pa.array([r["content"] for r in rows], pa.string()),
            }
        ),
        os.path.join(tmp, "code_files.parquet"),
    )

    rids = [r["row_id"] for r in rows]
    langs = [r["lang"] for r in rows]
    norms = lexed_norm_rows([r["content"] for r in rows], langs)
    ctoks, _grams, wfps, keys = code_feature_rows(norms)
    pq.write_table(
        pa.table(
            {
                "rid": pa.array(rids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "norm_hash": pa.array(
                    [norm_hash_py(n) for n in norms], pa.string()
                ),
                "ctoks": pa.array(ctoks, pa.string()),
            }
        ),
        os.path.join(tmp, "code_ctoks.parquet"),
    )

    pq.write_table(
        pa.table(
            {
                "rid": pa.array(
                    [r for r, ks in zip(rids, keys) for _ in ks], pa.int64()
                ),
                "lang": pa.array(
                    [lg for lg, ks in zip(langs, keys) for _ in ks], pa.string()
                ),
                "bkey": pa.array([k for ks in keys for k in ks], pa.int64()),
            }
        ),
        os.path.join(tmp, "code_bands.parquet"),
    )

    pq.write_table(
        pa.table(
            {
                "rid": pa.array(
                    [r for r, fs in zip(rids, wfps) for _ in fs], pa.int64()
                ),
                "lang": pa.array(
                    [lg for lg, fs in zip(langs, wfps) for _ in fs],
                    pa.string(),
                ),
                "fp": pa.array(
                    np.concatenate([w for w in wfps]).astype(np.int64)
                    if wfps
                    else np.empty(0, dtype=np.int64),
                    pa.int64(),
                ),
            }
        ),
        os.path.join(tmp, "code_wfps.parquet"),
    )


def ensure_code_fixture() -> str:
    """Build the fixture parquet files if missing; returns CODE_FIXTURE_DIR."""
    if os.path.isdir(CODE_FIXTURE_DIR):
        return CODE_FIXTURE_DIR
    tmp = f"{CODE_FIXTURE_DIR}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    _build(tmp)
    try:
        os.rename(tmp, CODE_FIXTURE_DIR)
    except OSError:  # lost the race; the other builder's copy is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return CODE_FIXTURE_DIR

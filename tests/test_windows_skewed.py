"""Relational window/agg paths under SKEWED key cardinality (round-4
verdict ask #8).

The driver's oracle harness runs events_by_type / user_sessions /
parts_revenue over uniform synthetic tables; this replays the same
Spark-query-vs-DuckDB-oracle comparison over a deliberately skewed
fixture: one user owns ~30% of all events (a mega session-window
partition), one event_type owns ~70% of rows (a mega groupBy key), one
part owns ~20% of lineitems (a skewed join + agg key), plus tie-heavy
timestamps (equal ts within a user — the lag() order must stay total via
the event_id tiebreak, or results silently become nondeterministic).

The comparison discipline mirrors the driver: same parquet input for both
engines, columns sorted by name, rows sorted by all columns, exact
equality after the queries' own rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

N_EVENTS = 20_000
N_LINE = 20_000
N_PARTS = 200
SEED = 20260820


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """A sf-dir-shaped directory holding the skewed tables."""
    rng = np.random.default_rng(SEED)
    d = tmp_path_factory.mktemp("skewfix")

    # events: user 7 owns ~30%, event_type 'view' ~70%, ts heavily tied
    user = np.where(
        rng.random(N_EVENTS) < 0.30, 7, rng.integers(0, 500, N_EVENTS)
    )
    etype = np.where(
        rng.random(N_EVENTS) < 0.70,
        "view",
        rng.choice(["click", "buy", "share"], N_EVENTS),
    )
    # seconds quantized to 10-minute buckets: many exact ties inside a
    # user's ordering window + real >30-min session gaps
    secs = rng.integers(0, 6 * 86400, N_EVENTS) // 600 * 600
    events = pd.DataFrame(
        {
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            # micros, not pandas' default nanos: Spark rejects
            # TIMESTAMP(NANOS) parquet columns
            "ts": pd.to_datetime(secs, unit="s").astype("datetime64[us]"),
            "user_id": user.astype(np.int64),
            "event_type": etype,
            "value": rng.integers(0, 10_000, N_EVENTS) / 100.0,
            "props": ["{}"] * N_EVENTS,
        }
    )
    events.to_parquet(d / "events.parquet", index=False)

    # lineitem: part 3 owns ~20% of rows
    partkey = np.where(
        rng.random(N_LINE) < 0.20, 3, rng.integers(0, N_PARTS, N_LINE)
    )
    line = pd.DataFrame(
        {
            "l_orderkey": np.arange(N_LINE, dtype=np.int64) // 4,
            "l_partkey": partkey.astype(np.int64),
            "l_suppkey": rng.integers(0, 50, N_LINE),
            "l_linenumber": (np.arange(N_LINE) % 7).astype(np.int32),
            "l_quantity": rng.integers(1, 50, N_LINE).astype(np.float64),
            "l_extendedprice": rng.integers(100, 10_000, N_LINE) / 1.0,
            "l_discount": rng.integers(0, 10, N_LINE) / 100.0,
            "l_tax": rng.integers(0, 8, N_LINE) / 100.0,
            "l_returnflag": rng.choice(["A", "N", "R"], N_LINE),
            "l_linestatus": rng.choice(["O", "F"], N_LINE),
            "l_shipdate": pd.to_datetime(
                rng.integers(0, 365, N_LINE), unit="D", origin="2024-01-01"
            ).astype("datetime64[us]"),
        }
    )
    line.to_parquet(d / "lineitem.parquet", index=False)

    part = pd.DataFrame(
        {
            "p_partkey": np.arange(N_PARTS, dtype=np.int64),
            "p_name": [f"part {i} azure {i % 9}" for i in range(N_PARTS)],
            "p_brand": [f"Brand#{i % 5}" for i in range(N_PARTS)],
            "p_type": ["STANDARD"] * N_PARTS,
            "p_size": (np.arange(N_PARTS) % 50).astype(np.int32),
            "p_retailprice": np.arange(N_PARTS) * 1.5,
        }
    )
    part.to_parquet(d / "part.parquet", index=False)
    return str(d)


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ("events", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), ignore_index=True)
    # driver-style value canonicalization: int-like columns compare as int64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


@pytest.mark.parametrize(
    "name", ["events_by_type", "user_sessions", "parts_revenue"]
)
def test_window_paths_match_oracle_under_skew(spark, skew_dir, name):
    got = _canon(entrymod.queries()[name](spark, skew_dir).toPandas())
    exp = _canon(_oracle(entrymod.oracle_sql()[name], skew_dir))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) > 0

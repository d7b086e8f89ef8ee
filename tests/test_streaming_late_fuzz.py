"""DuckDB-differential fuzz for the streaming_late_drop query/oracle pair.

The parity suite checks the pair on the two fixture scales; this fuzz
re-runs BOTH sides over seeded synthetic event tables engineered to sit
on the edges the fixtures may miss: timestamps exactly on interval
boundaries, duplicate timestamps, arrival-key ties (same ts + same
jitter residue, broken by event_id on both sides), and non-contiguous
shuffled event_ids (the jitter hash must not assume density).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod

HOUR_MS = 3_600_000


def _mk_events(tmpdir: str, seed: int, n: int) -> str:
    rng = np.random.default_rng(seed)
    base_us = 1_704_067_200_000_000            # 2024-01-01 epoch µs
    span_ms = 5 * 24 * HOUR_MS                 # 5 days
    ts_ms = np.sort(rng.integers(0, span_ms, n))
    # plant edge timestamps: exact interval boundaries and duplicates
    edge = rng.choice(n, size=n // 20, replace=False)
    ts_ms[edge] = (ts_ms[edge] // HOUR_MS) * HOUR_MS
    dup = rng.choice(n - 1, size=n // 20, replace=False)
    ts_ms[dup + 1] = ts_ms[dup]
    ts_ms = np.sort(ts_ms)
    # sparse, shuffled, non-contiguous ids (stress the jitter hash)
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 17 + 3)
    types = rng.choice(["error", "signup", "purchase", "view", "click"], n)
    value = rng.integers(0, 1_000_000, n) / 100.0
    t = pa.table({
        "event_id": pa.array(ids),
        "ts": pa.array((base_us + ts_ms * 1000).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 500, n)),
        "event_type": pa.array(types),
        "value": pa.array(value),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize("seed,n", [(1, 3000), (2, 4000), (3, 2500)])
def test_streaming_late_drop_differential(tmp_path, seed, n):
    sf_dir = _mk_events(str(tmp_path), seed, n)
    ours = (entrymod.queries()["streaming_late_drop"](sf_dir)
            .to_pandas()
            .sort_values(["event_type", "interval_ms"])
            .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    theirs = (con.execute(entrymod.oracle_sql()["streaming_late_drop"])
              .fetchdf()
              .sort_values(["event_type", "interval_ms"])
              .reset_index(drop=True))
    assert len(ours) == len(theirs) > 0
    pd.testing.assert_frame_equal(
        ours[theirs.columns].astype({"n": "int64"}),
        theirs.astype({"n": "int64"}))

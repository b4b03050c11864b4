"""Behavioral fixture tests for the round-14 operator batch: each
constructs a corpus where the operator's DISTINGUISHING property must
fire (the claim that separates it from its nearest sibling), runs the
registered query against the DuckDB oracle with the strict harness,
and asserts the behavior — not just the cross-engine match."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from hyperloglog_pyspark_spark.registry import REGISTRY, oracle_sql, queries
from tests.helpers import compare


def _write_events(d: str, rows: list[tuple]) -> None:
    """rows: (event_id, ts_iso, user_id, event_type, value)"""
    import datetime

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [datetime.datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


def _duck(d: str, table: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{d}/{table}.parquet')"
    )
    return con


def test_theil_sen_ignores_outlier_day_ols_does_not(spark, tmp_path_factory):
    """The operator's reason to exist: one corrupted day (a 50× volume
    spike on an otherwise exactly-linear series) drags the OLS slope
    far from truth while the Theil-Sen median slope stays EXACTLY on
    the true trend — pairwise slopes through the outlier are a minority
    and the median never selects them."""
    queries()
    d = str(tmp_path_factory.mktemp("theilsen"))
    rows = []
    eid = 0
    # type 'lin': y = 10 + 2*day for 15 days, the LAST day spiked to
    # 1000 (an endpoint has maximal OLS leverage; a mid-series spike
    # moves only the intercept)
    for day in range(15):
        n = 1000 if day == 14 else 10 + 2 * day
        for _ in range(n):
            rows.append((eid, f"2024-01-{day + 1:02d}T12:00:00", 1, "lin", 1.0))
            eid += 1
    _write_events(d, rows)
    con = _duck(d, "events")
    df = REGISTRY["timeseries_theil_sen"].fn(spark, d)
    compare(df, con, oracle_sql()["timeseries_theil_sen"], "theil_sen_fix")
    row = {r["event_type"]: r for r in df.collect()}["lin"]
    assert row["n_days"] == 15 and row["n_pairs"] == 105
    # true slope = 2/day = 2_000_000 micro; TS must read exactly that
    assert row["theil_sen_micro"] == 2_000_000
    # OLS is dragged by the spike — far outside any rounding story
    assert abs(row["ols_micro"] - 2_000_000) > 5_000_000


def test_t_closeness_flags_homogeneous_rich_class(spark, tmp_path_factory):
    """A class can pass k-anonymity (large) AND l-diversity (several
    distinct buckets) yet leak distributionally: a (nation, segment)
    class whose balances all sit in the global distribution's rare top
    bucket must read a large EMD and exceed t, while a class that
    mirrors the global mix must not."""
    queries()
    d = str(tmp_path_factory.mktemp("tclose"))
    custkeys, names, nats, bals, segs = [], [], [], [], []

    def add(nat, seg, bal, n):
        for _ in range(n):
            k = len(custkeys)
            custkeys.append(k)
            names.append(f"Customer#{k:09d}")
            nats.append(nat)
            bals.append(float(bal))
            segs.append(seg)

    # background: 3 classes mirroring a mix over buckets 0/1/2
    for nat in (0, 1, 2):
        add(nat, "MIX", 500.00, 20)    # bucket 0
        add(nat, "MIX", 1500.00, 20)   # bucket 1
        add(nat, "MIX", 2500.00, 20)   # bucket 2
    # the leaking class: k=30 (big), l=2 (diverse enough), but ~all of
    # it concentrated in bucket 9 — a bucket the background never hits
    add(3, "RICH", 9500.00, 29)
    add(3, "RICH", 500.00, 1)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(custkeys, pa.int64()),
                "c_name": pa.array(names),
                "c_nationkey": pa.array(nats, pa.int32()),
                "c_acctbal": pa.array(bals, pa.float64()),
                "c_mktsegment": pa.array(segs),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    con = _duck(d, "customer")
    df = REGISTRY["governance_t_closeness"].fn(spark, d)
    compare(df, con, oracle_sql()["governance_t_closeness"], "tclose_fix")
    got = {(r["nationkey"], r["segment"]): r for r in df.collect()}
    assert got[(3, "RICH")]["exceeds_t"] is True
    for nat in (0, 1, 2):
        assert got[(nat, "MIX")]["exceeds_t"] is False
    # the RICH class's EMD dwarfs every MIX class's
    assert got[(3, "RICH")]["emd_ppm"] > 3 * max(
        got[(nat, "MIX")]["emd_ppm"] for nat in (0, 1, 2)
    )


def test_weighted_jaccard_separates_template_repetition(spark, tmp_path_factory):
    """The bag-vs-set distinction the operator exists for: doc B repeats
    doc A's text four times. SET 3-gram Jaccard reads them as highly
    similar (B's distinct shingles ≈ A's, plus the seam grams), but the
    WEIGHTED form divides shared mass by B's full multiset size — the
    pair drops below the 0.5 threshold for the bag form while a true
    near-identical pair stays above it."""
    queries()
    d = str(tmp_path_factory.mktemp("wjac"))
    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        base,                                   # 0: canonical
        " ".join([base] * 4),                   # 1: the 4x template stuffer
        base + " iota",                          # 2: near-identical to 0
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["fix"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    con = _duck(d, "documents")
    df = REGISTRY["dedup_weighted_jaccard"].fn(spark, d)
    compare(df, con, oracle_sql()["dedup_weighted_jaccard"], "wjac_fix")
    pairs = {(r["doc_a"], r["doc_b"]): r["w_jaccard"] for r in df.collect()}
    # true near-dup pair (0, 2) survives the bag threshold
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5
    # the 4x-stuffed pair (0, 1) must NOT pass the weighted threshold:
    # shared bag mass is |A| once, but B's bag is ~4x larger
    assert (0, 1) not in pairs
    # sanity on the set form's contrast: distinct-shingle Jaccard for
    # (0, 1) is high (B adds only seam grams) — compute it directly
    a = set(
        " ".join(base.split()[i : i + 3]) for i in range(len(base.split()) - 2)
    )
    bwords = " ".join([base] * 4).split()
    b = set(
        " ".join(bwords[i : i + 3]) for i in range(len(bwords) - 2)
    )
    assert len(a & b) / len(a | b) > 0.5  # the set form WOULD have matched

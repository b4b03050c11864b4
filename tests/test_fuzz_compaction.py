"""Property fuzzing for layout_compaction_plan: random tiny event sets
(days, id gaps, variable props payloads) against a pure-Python replay of
the whole planning contract — manifest derivation, the corpus-derived
target, right-sized skipping, size-descending running-total bin packing,
and the per-day rollup. The fixed-corpus oracle pins one manifest shape;
this pins the semantics on arbitrary ones (empty small-file tails, days
that are all whale, single-file days, byte ties).

Each example round-trips a real parquet file through
sources.catalog.load_table (timestamps land as epoch-micros UTC, the
shape the catalog normalizes), mirroring the registered query exactly.
"""

from __future__ import annotations

import datetime
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings, strategies as st

from hyperloglog_pyspark_spark.operators.layoutops import (
    COMPACT_ROW_OVERHEAD,
    COMPACT_SHARDS,
    COMPACT_TARGET_X,
)
from hyperloglog_pyspark_spark.registry import REGISTRY, queries

queries()

_DAY_US = 86_400_000_000
_T0 = 1_700_006_400_000_000  # 2023-11-15 00:00:00 UTC, mid-day-safe


@st.composite
def event_sets(draw):
    n = draw(st.integers(4, 60))
    rows = []
    for i in range(n):
        eid = draw(st.integers(0, 400))
        day = draw(st.integers(0, 2))
        us = _T0 + day * _DAY_US + draw(st.integers(0, _DAY_US - 1))
        props = "x" * draw(st.integers(0, 30))
        rows.append((eid, us, props))
    return rows


def _write_events(rows, dirpath):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] % 7 for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([r[2] for r in rows]),
            }
        ),
        f"{dirpath}/events.parquet",
    )


def _reference(rows):
    man: dict[tuple, int] = defaultdict(int)
    for eid, us, props in rows:
        day = datetime.datetime.fromtimestamp(
            us / 1e6, tz=datetime.timezone.utc
        ).date()
        fid = 0 if eid % 2 == 0 else eid % COMPACT_SHARDS
        man[(day, fid)] += COMPACT_ROW_OVERHEAD + len(props)
    tgt = COMPACT_TARGET_X * (sum(man.values()) // len(man))
    by_day: dict = defaultdict(list)
    for (day, fid), b in man.items():
        by_day[day].append((b, fid))
    want = {}
    for day, files in by_day.items():
        files.sort(key=lambda x: (-x[0], x[1]))
        smalls = [b for b, _ in files if b < tgt]
        n_right = len(files) - len(smalls)
        cum = 0
        bins: dict[int, int] = defaultdict(int)
        for b in smalls:  # right-sized rows sort first and add 0 to cum
            bins[cum // tgt] += b
            cum += b
        # left-join contract: a fully-compacted day reports 0 bins, not
        # a vanished row
        denom = n_right + len(bins)
        red = float(
            Decimal(len(files)) / Decimal(denom)
        )
        red = float(
            Decimal(str(red)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )
        want[day] = (
            len(files),
            n_right,
            len(smalls),
            len(bins),
            sum(b for b, _ in files),
            max(bins.values()) if bins else 0,
            red,
        )
    return want


@given(rows=event_sets())
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compaction_plan_matches_reference(rows, spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("compactfuzz"))
    _write_events(rows, d)
    want = _reference(rows)
    got = {
        r["day"]: (
            r["n_input_files"],
            r["n_right_sized"],
            r["n_small_files"],
            r["n_output_bins"],
            r["bytes_total"],
            r["max_bin_bytes"],
            r["file_reduction"],
        )
        for r in REGISTRY["layout_compaction_plan"].fn(spark, d).collect()
    }
    assert got == want

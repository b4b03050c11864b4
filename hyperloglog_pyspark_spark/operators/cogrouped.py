"""Cogrouped-map operator: per-key custom logic over TWO tables at once
(``groupBy().cogroup().applyInPandas``) — the API for stateless per-key
algorithms that need both sides materialized together (alignment,
interleaving, per-entity reconciliation) and don't decompose into a join.

The semantics chosen here — purchase-to-order as-of attribution — ARE
join-expressible on purpose (join_asof covers the declarative form,
operators/relational.py:323): an exact DuckDB oracle then verifies the
cogroup plumbing end-to-end, which a genuinely join-inexpressible example
could not. The reference has no two-table operators at all (it is an HLL
sketch library, HLL/HyperLogLog.py); this extends the engine's UDF surface
per SURVEY.md §2.2.

Scale: cogroup shuffles each side ONCE on the key (same exchange a join
would need), then streams one key-group pair per pandas call — Arrow
batches, no driver involvement, state bounded by the largest single key
(here: one user's events + orders). Skewed keys are the risk at 100 TB;
mitigate by sub-splitting hot keys upstream (salt the group key and merge
per-salt results) — noted rather than applied, as user_id is uniform here.

Cost model (measured): the per-group Python invocation dominates when
groups are small — at sf0.1 (1.5k users × ~13 purchases) this runs ~30s
where the equivalent join runs <1s. Cogroup is the right tool for FEW,
FAT groups (per-entity reconciliation over thousands of rows each), not
many thin ones — for thin groups use the declarative as-of join
(operators/relational.py:323). Kept out of the bench headline set for
exactly that documented reason.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from hyperloglog_pyspark_spark.registry import register
from hyperloglog_pyspark_spark.sources.catalog import load_table

_OUT_SCHEMA = "event_id long, user_id long, order_key long, order_price double"


def _attribute(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Attribute each event to the latest order with date ≤ event ts.

    Orders are sorted by (date, orderkey); searchsorted(side='right') finds
    the last qualifying index, so date ties resolve to the largest orderkey
    — the same total order the oracle's ROW_NUMBER imposes.
    """
    if left.empty:
        return pd.DataFrame(
            {"event_id": [], "user_id": [], "order_key": [], "order_price": []}
        ).astype({"event_id": "int64", "user_id": "int64", "order_key": "Int64", "order_price": "float64"})
    out = pd.DataFrame(
        {"event_id": left["event_id"].to_numpy(), "user_id": left["user_id"].to_numpy()}
    )
    if right.empty:
        out["order_key"] = pd.array([pd.NA] * len(out), dtype="Int64")
        out["order_price"] = np.nan
        return out
    r = right.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
    odate = r["o_orderdate"].to_numpy(dtype="datetime64[ns]").astype("int64")
    ts = left["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
    idx = np.searchsorted(odate, ts, side="right") - 1
    hit = idx >= 0
    keys = r["o_orderkey"].to_numpy()[np.clip(idx, 0, None)]
    price = r["o_totalprice"].to_numpy()[np.clip(idx, 0, None)]
    out["order_key"] = pd.array(np.where(hit, keys, 0), dtype="Int64")
    out.loc[~hit, "order_key"] = pd.NA
    out["order_price"] = np.where(hit, np.round(price, 2), np.nan)
    return out


@register(
    "cogroup_asof_attribution",
    category="udf",
    oracle="""
    WITH cand AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        WHERE e.event_type = 'purchase'
    )
    SELECT event_id, user_id,
           o_orderkey AS order_key,
           ROUND(o_totalprice, 2) AS order_price
    FROM cand WHERE rn = 1
    """,
)
def cogroup_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase attribution: every purchase event joined to the user's most
    recent order at-or-before the event time, computed per user inside a
    cogrouped pandas function (events ⋈ orders cogrouped on user/custkey).
    Date ties break to the largest orderkey — deterministic cross-engine."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return _attribute(left, right)

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("o_custkey"))
        .applyInPandas(fn, schema=_OUT_SCHEMA)
    )

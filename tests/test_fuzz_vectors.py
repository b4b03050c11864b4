"""Property fuzzing for the array-native vector layer behind the r7
embedding-family rewrite (semdedup / k-means / centroid-confusion /
IVF), checking the exactness claims the end-to-end oracles rely on but
random corpus data rarely stresses —

- ``dot_long`` is the EXACT integer dot product (bit-equal to Python
  bigint arithmetic, including negatives and zero-length arrays);
- ``as_milli`` quantizes exactly like the oracle twin: float32 → double
  FIRST, then floor(x·1000 + 0.5) — pinned against a numpy reference
  per element, including negative values where floor(+0.5) differs
  from round-half-away;
- ``_nearest_centroid`` over ``_centroid_set`` implements the
  (d2 ASC, k ASC) argmin EXACTLY — fuzzed with deliberately DUPLICATED
  centroids so exact d2 ties occur (random reals never tie) and the
  smaller k must win, matching the oracle's ROW_NUMBER tie-break;
- ``_label_centroid_arrays`` equals the per-element reference:
  floor(sum/n + 0.5) of exact integer element sums per (label, dim).

Corpora are tiny — each example is a real Spark round-trip, so example
counts are kept low; ``derandomize=True`` keeps CI stable.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hyperloglog_pyspark_spark.functions.vector import dot_long
from hyperloglog_pyspark_spark.operators.similarity import (
    _centroid_set,
    _label_centroid_arrays,
    _nearest_centroid,
    as_milli,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_longs = st.integers(-10_000, 10_000)


@st.composite
def long_vec_pairs(draw):
    d = draw(st.integers(1, 8))
    a = draw(st.lists(_longs, min_size=d, max_size=d))
    b = draw(st.lists(_longs, min_size=d, max_size=d))
    return a, b


@given(pair=long_vec_pairs())
@_SETTINGS
def test_dot_long_is_exact_integer_dot(pair, spark):
    a, b = pair
    df = spark.createDataFrame([(a, b)], "a array<long>, b array<long>")
    got = df.select(dot_long(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    assert got == sum(x * y for x, y in zip(a, b))


_floats = st.floats(
    min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False, width=32
)


@given(vals=st.lists(_floats, min_size=1, max_size=8))
@_SETTINGS
def test_as_milli_matches_float32_then_double_floor(vals, spark):
    df = spark.createDataFrame([(vals,)], "embedding array<float>")
    got = df.select(as_milli("embedding").alias("mv")).collect()[0]["mv"]
    # reference: parquet/DataFrame stores float32; the cast to double
    # happens BEFORE scaling (the oracle-hash-breaking order)
    ref = [int(math.floor(float(np.float32(v)) * 1000 + 0.5)) for v in vals]
    assert got == ref


@st.composite
def corpus_and_centroids(draw):
    """Milli-unit vectors + centroid arrays with DUPLICATION pressure:
    some centroids copy earlier ones (exact d2 ties), and some vectors
    copy a centroid exactly (d2 = 0 at multiple ks when duplicated)."""
    d = draw(st.integers(1, 5))
    n_cent = draw(st.integers(2, 5))
    cents: list[list[int]] = []
    for i in range(n_cent):
        if i > 0 and draw(st.booleans()):
            cents.append(cents[draw(st.integers(0, i - 1))])
        else:
            cents.append(draw(st.lists(_longs, min_size=d, max_size=d)))
    n_vec = draw(st.integers(2, 8))
    vecs: list[list[int]] = []
    for _ in range(n_vec):
        if draw(st.booleans()):
            vecs.append(cents[draw(st.integers(0, n_cent - 1))])
        else:
            vecs.append(draw(st.lists(_longs, min_size=d, max_size=d)))
    return vecs, cents


@given(data=corpus_and_centroids())
@_SETTINGS
def test_nearest_centroid_argmin_ties_break_on_smaller_k(data, spark):
    vecs, cents = data
    ev = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, mv array<long>"
    )
    cent = spark.createDataFrame(
        [(k, c) for k, c in enumerate(cents)], "k long, cv array<long>"
    )
    best = _nearest_centroid("mv")
    got = {
        r["vec_id"]: (r["d2"], r["k"])
        for r in ev.crossJoin(F.broadcast(_centroid_set(cent)))
        .select("vec_id", best["d2"].alias("d2"), best["k"].alias("k"))
        .collect()
    }
    for i, v in enumerate(vecs):
        ref = min(
            (sum((a - b) * (a - b) for a, b in zip(v, c)), k)
            for k, c in enumerate(cents)
        )
        assert got[i] == ref


@st.composite
def labeled_vectors(draw):
    d = draw(st.integers(1, 5))
    n = draw(st.integers(2, 10))
    rows = [
        (i, draw(st.integers(0, 2)), draw(st.lists(_longs, min_size=d, max_size=d)))
        for i in range(n)
    ]
    return rows


@given(rows=labeled_vectors())
@_SETTINGS
def test_label_centroid_arrays_matches_reference(rows, spark):
    ev = spark.createDataFrame(rows, "vec_id long, label long, mv array<long>")
    got = {
        r["k"]: r["cv"]
        for r in _label_centroid_arrays(ev, "k").collect()
    }
    by_label: dict[int, list[list[int]]] = {}
    for _, lbl, v in rows:
        by_label.setdefault(lbl, []).append(v)
    for lbl, vs in by_label.items():
        n = len(vs)
        ref = [
            int(math.floor(sum(v[i] for v in vs) / n + 0.5))
            for i in range(len(vs[0]))
        ]
        assert got[lbl] == ref


def test_residual_ivf_pq_monitor_beats_nonresidual(spark, sf_dir):
    """The r10 recall LADDER, strict at every rung: with the coarse
    probe SHARED (identical candidate sets), the mean-referenced
    trained residual ADC ranks true neighbors strictly better than the
    seeded non-residual ADC, and the exact-refine stage over the ADC
    shortlist strictly beats pure ADC again. Measured hits at
    sf0.001 / sf0.01 / sf0.1: non-residual 7 / 8 / 4 < residual
    12 / 13 / 5 < rerank 23 / 24 / 14 (ceilings 51 / 27 at the larger
    SFs); the raw-centroid-reference ablations that LOSE are recorded
    in BASELINE.md."""
    from hyperloglog_pyspark_spark.operators.similarity import (
        similarity_ivf_pq_recall,
        similarity_ivf_pq_rerank_recall,
        similarity_ivf_pq_residual_recall,
    )

    rer = similarity_ivf_pq_rerank_recall(spark, sf_dir).toPandas()
    res = similarity_ivf_pq_residual_recall(spark, sf_dir).toPandas()
    non = similarity_ivf_pq_recall(spark, sf_dir).toPandas()
    n_rer, n_res, n_non = (
        int(rer.n_hits.sum()), int(res.n_hits.sum()), int(non.n_hits.sum())
    )
    assert n_non < n_res < n_rer, f"ladder broke: {n_non} / {n_res} / {n_rer}"


def test_matryoshka_refine_beats_coarse_only(spark, sf_dir):
    """The Matryoshka two-stage contract: full-dim exact rerank over the
    prefix-scored shortlist recovers strictly more true neighbors than
    serving top-k straight off the prefix scores. Measured hits (of 80)
    at sf0.001 / 0.01 / 0.1: coarse-only 22 / 28 / 19 < refined
    50 / 53 / 41 — the refine roughly doubles recall at every scale;
    per-query hits stay >= 3 with MRL_PREFIX=32 (prefix 16 bottoms out
    at 0 on this isotropic corpus — recorded in the operator docstring)."""
    from pyspark.sql import functions as F

    from hyperloglog_pyspark_spark.functions.vector import as_double
    from hyperloglog_pyspark_spark.operators.similarity import (
        MRL_PREFIX,
        _bruteforce_topk,
        similarity_matryoshka_recall,
    )
    from hyperloglog_pyspark_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    bf = _bruteforce_topk(emb).select("query_id", "vec_id")
    coarse = _bruteforce_topk(
        emb.select("vec_id", F.slice("e", 1, MRL_PREFIX).alias("e"))
    ).select("query_id", "vec_id")
    coarse_hits = bf.join(coarse, ["query_id", "vec_id"]).count()

    rec = similarity_matryoshka_recall(spark, sf_dir).toPandas()
    assert (rec.n_exact == 10).all()
    assert int(rec.n_hits.min()) >= 1
    refined_hits = int(rec.n_hits.sum())
    assert coarse_hits < refined_hits, f"{coarse_hits} !< {refined_hits}"


def test_anisotropy_survives_large_magnitude_corpus(spark, tmp_path_factory):
    """Regression for the r13 overflow fix: elements at 1e6 units (1e9
    milli-units) push n·Σe² to ~1e24 — past int64, which the pre-r13
    BIGINT moments crashed on at N ~ 3e6 rows or, as here, at ANY row
    count once magnitudes grow — while a tight spread keeps the variance
    numerator < 2^53, so the decimal(38,0)/HUGEINT pipeline must agree
    bit-for-bit across engines (strict helpers.compare, no tolerance).
    Also exercises the reduction: numer digits stay <= 14 so red_k = 1,
    and the huge-s1/s2 path is the part int64 could never hold."""
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hyperloglog_pyspark_spark.registry import REGISTRY, oracle_sql, queries

    queries()
    d = str(tmp_path_factory.mktemp("anisobig"))
    rng = np.random.default_rng(13)
    n, dim = 1000, 64
    # 1e6 base + jitter in exact-float32 steps of 0.125 (ulp @1e6 = 0.0625)
    vecs = (1e6 + rng.integers(-4, 5, size=(n, dim)) * 0.125).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v for v in vecs.tolist()], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 5 for i in range(n)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    from tests.helpers import compare

    compare(
        REGISTRY["embedding_anisotropy_report"].fn(spark, d),
        con,
        oracle_sql()["embedding_anisotropy_report"],
        "anisotropy_large_magnitude",
    )


def test_rebuild_policy_pages_on_distribution_drift(spark, tmp_path_factory):
    """ann_rebuild_policy's rebuild_needed=True path: base vectors live
    in subspace A (dims 0-31), the append classes (vec_id % 7 ∈ {1, 4})
    arrive in the ORTHOGONAL subspace B (dims 32-63). The frozen
    quantizer has only A cells, so appended serving scatters the B
    cluster across unrelated cells and B queries lose recall; a rebuilt
    quantizer gains B seeds (200 % 7 = 4, 400 % 7 = 1) and recovers
    them. Epoch 0 must stay at parity (identical quantizers); the grown
    epochs must page. Engines strict-compared via helpers.compare."""
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hyperloglog_pyspark_spark.registry import REGISTRY, oracle_sql, queries
    from tests.helpers import compare

    queries()
    d = str(tmp_path_factory.mktemp("drift"))
    rng = np.random.default_rng(7)
    n, dim = 700, 64
    vecs = np.zeros((n, dim), dtype=np.float32)
    for i in range(n):
        is_b = i % 7 in (1, 4)
        lo, hi = (32, 64) if is_b else (0, 32)
        vecs[i, lo:hi] = (
            1.0 + rng.integers(-32, 33, size=32) / 64.0
        ).astype(np.float32)
        if is_b:
            # small A-subspace noise: exactly-orthogonal B vectors would
            # tie at dot = 0 against every A centroid and the tie-break
            # would herd the whole cluster into one cell — the noise
            # makes the stale assignment genuinely scatter
            vecs[i, 0:32] = (rng.integers(-8, 9, size=32) / 64.0).astype(
                np.float32
            )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [v for v in vecs.tolist()], pa.list_(pa.float32())
                ),
                "label": pa.array([i % 5 for i in range(n)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    df = REGISTRY["ann_rebuild_policy"].fn(spark, d)
    compare(df, con, oracle_sql()["ann_rebuild_policy"], "rebuild_drift")
    rows = {r["epoch"]: r for r in df.collect()}
    assert rows[0]["hits_appended"] == rows[0]["hits_rebuilt"]
    assert not rows[0]["rebuild_needed"]
    for e in (1, 2):
        assert rows[e]["hits_appended"] < rows[e]["hits_rebuilt"], rows[e]
        assert rows[e]["rebuild_needed"], rows[e]

"""Differential fuzz for the (m, k)-grain Lloyd trainer behind
similarity_pq_trained_codebook and the residual IVF-PQ codebook
(similarity._pq_lloyd_train + _pq_seed_model + _pq_assign_codes):
the broadcast-model / struct-keyed-map-merge implementation must equal
a direct pure-Python reference on EVERY example — including the cases
random corpus data rarely stresses:

- duplicated vectors (exact d2 ties → the (d2 ASC, k ASC) tie-break);
- duplicated SEED vectors (one seed captures nothing on round 1 → the
  empty-cell COALESCE keeps its previous centroid);
- negative milli values (floor(+0.5) ≠ round-half-away);
- per-subspace independence (a vector may assign to seed 3 in m=0 and
  seed 7 in m=1 — the reference tracks (m, k) pairs, so any cross-m
  bleed in the struct-keyed map merge fails loudly).

The md5 seed CHOICE is replicated with hashlib so the reference and
the engine pick identical seed identities.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from hyperloglog_pyspark_spark.operators.similarity import (
    EMB_DIM,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    PQ_TRAIN_ITERS,
    _pq_assign_codes,
    _pq_lloyd_train,
    _pq_seed_model,
    _pq_sub_milli,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _floor_half_up(x: float) -> int:
    import math

    return int(math.floor(x + 0.5))


def _ref_train_and_encode(vecs: dict[int, list[int]]):
    """Pure-Python twin of seed → PQ_TRAIN_ITERS Lloyd rounds → encode.

    Returns (model, codes): model[(m, k)] = centroid subvector list,
    codes[(vec_id, m)] = (k, d2)."""
    ids = sorted(vecs)
    seeds = sorted(ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[
        :PQ_K
    ]

    def sub(v: list[int], m: int) -> list[int]:
        return v[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]

    model = {
        (m, k): sub(vecs[k], m) for k in seeds for m in range(PQ_M)
    }

    def d2(a: list[int], b: list[int]) -> int:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign_all(mdl):
        out = {}
        for vid in ids:
            for m in range(PQ_M):
                sv = sub(vecs[vid], m)
                out[(vid, m)] = min(
                    (d2(sv, mdl[(m, k)]), k) for k in seeds
                )
        return out

    for _ in range(PQ_TRAIN_ITERS):
        asg = assign_all(model)
        sums: dict[tuple, list[int]] = {}
        counts: dict[tuple, int] = {}
        for (vid, m), (_, k) in asg.items():
            sv = sub(vecs[vid], m)
            acc = sums.setdefault((m, k), [0] * PQ_SUBDIM)
            for j, e in enumerate(sv):
                acc[j] += e
            counts[(m, k)] = counts.get((m, k), 0) + 1
        model = {
            (m, k): (
                [
                    _floor_half_up(sums[(m, k)][j] / counts[(m, k)])
                    for j in range(PQ_SUBDIM)
                ]
                if (m, k) in counts
                else model[(m, k)]  # empty cell keeps its previous centroid
            )
            for (m, k) in model
        }
    codes = {key: (k, d) for key, (d, k) in assign_all(model).items()}
    return model, codes


@st.composite
def milli_corpora(draw):
    """5..10 vectors (possibly FEWER than PQ_K) of EMB_DIM small milli-ints, with duplication baked
    in: a base pool of 2..4 distinct vectors is sampled WITH replacement
    (duplicate vectors AND duplicate seed vectors become common), then a
    per-vector jitter flag occasionally perturbs one element."""
    # deliberately allows n < PQ_K: _pq_seed_model then yields FEWER
    # than K seeds (limit on a short frame) and the reference slices the
    # same shorter md5-ordered list — the seed-shortfall regime
    n = draw(st.integers(5, 10))
    pool_n = draw(st.integers(2, 4))
    pool = [
        draw(
            st.lists(
                st.integers(-50, 50), min_size=EMB_DIM, max_size=EMB_DIM
            )
        )
        for _ in range(pool_n)
    ]
    vecs = {}
    for vid in range(n):
        v = list(pool[draw(st.integers(0, pool_n - 1))])
        if draw(st.booleans()):
            pos = draw(st.integers(0, EMB_DIM - 1))
            v[pos] += draw(st.integers(-3, 3))
        vecs[vid] = v
    return vecs


@given(vecs=milli_corpora())
@_SETTINGS
def test_pq_lloyd_train_matches_python_reference(vecs, spark):
    rows = [(vid, v) for vid, v in sorted(vecs.items())]
    frame = spark.createDataFrame(rows, "vec_id long, mv array<long>")
    sub = _pq_sub_milli(frame, "mv")
    model = _pq_lloyd_train(sub, _pq_seed_model(frame, "mv"))
    got_model = {
        (c["m"], c["k"]): list(c["cv"])
        for c in model.collect()[0]["cents"]
    }
    got_codes = {
        (r.vec_id, r.m): (r.k, r.d2)
        for r in _pq_assign_codes(sub, model).collect()
    }
    want_model, want_codes = _ref_train_and_encode(vecs)
    assert got_model == want_model
    assert got_codes == want_codes

#!/usr/bin/env python
"""Anisotropic-embeddings probe (round-11 verdict #4).

BASELINE.md records two negative results explicitly re-openable "if the
corpus gains anisotropic structure": the OPQ-lite snake-draft dimension
permutation (no recall gain on the uniform corpus) and the MRL prefix-16
coarse pass (recall 0 on the isotropic corpus). This probe MANUFACTURES
that structure and re-runs the ablations, so both items can be closed or
re-opened on data instead of a guess.

Corpus variants (written under WORK_DIR per sf, embeddings.parquet only
— every query under test loads only the embeddings table):

  aniso      — e'_i = e_i * DECAY^i (float32). A geometric variance
               spectrum, var ratio dim0:dim63 ≈ DECAY^-126 ≈ 4e4;
               analytic participation ratio ≈ 12 of 64 — firmly
               anisotropic (embedding_anisotropy_report must flip its
               verdict, which this probe asserts).
  aniso_opq  — aniso with its DIMENSIONS REORDERED by the OPQ-lite
               snake draft: dims sorted by variance desc are dealt to
               the PQ_M subspaces boustrophedon (0123 3210 0123 ...),
               then laid out subspace-contiguous. A global coordinate
               permutation leaves every full-vector distance unchanged
               (brute force, coarse probe and candidate sets are
               IDENTICAL to aniso), but balances per-subspace variance
               — isolating exactly the effect FAISS OPQ's rotation
               targets. Recall(aniso_opq) vs recall(aniso) on the
               residual index IS the OPQ ablation.

Measured per variant (recall hit totals over the 8-query panel, exact
counts, not timings — contention-immune):
  - embedding_anisotropy_report: participation ratio + verdict,
  - the recall ladder: ivf_pq (non-residual) / residual / rerank,
  - matryoshka at MRL_PREFIX=32 and (monkeypatched) 16.

Run: ``python anisotropy_probe.py [sf ...]`` (default sf0.001 sf0.01).
Results recorded in SCALE.md §"Anisotropic-corpus probe" and the
BASELINE.md negative-result entries.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK_DIR = "/tmp/spark_graft_aniso"
DECAY = 0.92  # per-dimension stddev decay of the manufactured spectrum


def _variants(src_sf_dir: str, out_base: str) -> dict[str, str]:
    from hyperloglog_pyspark_spark.operators.similarity import PQ_M

    t = pq.read_table(os.path.join(src_sf_dir, "embeddings.parquet"))
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    d = emb.shape[1]
    scales = DECAY ** np.arange(d)
    aniso = (emb * scales).astype(np.float32)

    # snake-draft permutation by per-dim variance (desc), dealt to PQ_M
    # subspaces, then flattened subspace-contiguous
    var = aniso.astype(np.float64).var(axis=0)
    order = np.argsort(-var, kind="stable")
    subs: list[list[int]] = [[] for _ in range(PQ_M)]
    for r in range(0, d, PQ_M):
        chunk = order[r : r + PQ_M]
        dest = range(PQ_M) if (r // PQ_M) % 2 == 0 else range(PQ_M - 1, -1, -1)
        for dim, s in zip(chunk, dest):
            subs[s].append(int(dim))
    perm = [dim for s in subs for dim in s]
    assert sorted(perm) == list(range(d))
    opq = aniso[:, perm]

    out = {}
    for tag, arr in (("aniso", aniso), ("aniso_opq", opq)):
        dd = os.path.join(out_base, tag)
        os.makedirs(dd, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": t["vec_id"],
                    "embedding": pa.array(
                        [row.tolist() for row in arr], pa.list_(pa.float32())
                    ),
                    "label": t["label"],
                }
            ),
            os.path.join(dd, "embeddings.parquet"),
        )
        out[tag] = dd
    return out


def _hits(df) -> int:
    return sum(r["n_hits"] for r in df.select("n_hits").collect())


def main() -> None:
    from hyperloglog_pyspark_spark import registry
    from hyperloglog_pyspark_spark.operators import similarity as S
    from hyperloglog_pyspark_spark.session import get_spark

    spark = get_spark("anisotropy-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.EAGER_CACHES = True
    registry.queries()
    R = registry.REGISTRY

    sfs = sys.argv[1:] or ["sf0.001", "sf0.01"]
    shutil.rmtree(WORK_DIR, ignore_errors=True)
    results = []
    for sf in sfs:
        src = f"/root/testdata/{sf}"
        dirs = {"base": src}
        dirs.update(_variants(src, os.path.join(WORK_DIR, sf)))
        for tag, d in dirs.items():
            registry.release_caches()
            spark.catalog.clearCache()
            rep = {
                r["dim_rank"]: r
                for r in R["embedding_anisotropy_report"].fn(spark, d).collect()
            }
            pr = rep[1]["participation_ratio"]
            flagged = rep[1]["is_anisotropic"]
            if tag != "base":
                assert flagged, f"{tag} must flag anisotropic (PR={pr})"
            row = {"sf": sf, "variant": tag,
                   "participation_ratio": round(pr, 2),
                   "is_anisotropic": bool(flagged)}
            for q in ("similarity_ivf_pq_recall",
                      "similarity_ivf_pq_residual_recall",
                      "similarity_ivf_pq_rerank_recall",
                      "similarity_matryoshka_recall"):
                registry.release_caches()
                spark.catalog.clearCache()
                row[q.replace("similarity_", "hits_")] = _hits(R[q].fn(spark, d))
            # MRL prefix-16 ablation (monkeypatched module constant —
            # Spark side only; no oracle is consulted here)
            old = S.MRL_PREFIX
            try:
                S.MRL_PREFIX = 16
                registry.release_caches()
                spark.catalog.clearCache()
                row["hits_matryoshka_prefix16"] = _hits(
                    R["similarity_matryoshka_recall"].fn(spark, d)
                )
            finally:
                S.MRL_PREFIX = old
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"probe": "anisotropy", "results": results}))


if __name__ == "__main__":
    main()

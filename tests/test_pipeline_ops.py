"""Semantic tests for the LLM-pipeline operators (beyond oracle equality):
does LSH actually find the planted near-dups, does ANN recall clear a
floor, does the multimodal stub behave."""

from __future__ import annotations

import pytest

from hyperloglog_pyspark_spark.registry import queries
from hyperloglog_pyspark_spark.operators.multimodal import decode_image, fake_decode_meta

ALL = queries()


def test_minhash_finds_all_high_jaccard_pairs(spark, sf_dir):
    """Every pair the exhaustive length-blocked scan finds at Jaccard ≥ 0.8
    must also be found by the LSH path (4 bands × 3 rows ⇒ detection prob
    ≈ 1 − (1 − s³)⁴ ≥ 0.996 at s = 0.8; the planted dups are ≥ 0.95)."""
    exhaustive = ALL["dedup_ngram_jaccard"](spark, sf_dir).toPandas()
    lsh = ALL["dedup_minhash_lsh"](spark, sf_dir).toPandas()
    want = {(r.doc_a, r.doc_b) for r in exhaustive.itertuples() if r.jaccard >= 0.8}
    got = {(r.doc_a, r.doc_b) for r in lsh.itertuples()}
    assert want, "fixture should contain planted near-duplicates"
    missed = want - got
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_ann_recall_floor(spark, sf_dir):
    """Multi-probe LSH recall@10 vs brute force. Uniform-random embeddings
    are the LSH worst case, so the floor is modest — the assertion guards
    against the bucketing being broken (recall ≈ 0), not against noise."""
    bf = ALL["similarity_topk_bruteforce"](spark, sf_dir).toPandas()
    ann = ALL["similarity_ann_lsh"](spark, sf_dir).toPandas()
    recalls = []
    for q in bf.query_id.unique():
        want = set(bf[bf.query_id == q].vec_id)
        got = set(ann[ann.query_id == q].vec_id)
        recalls.append(len(want & got) / len(want))
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.15, f"ANN recall collapsed: {recalls}"


def test_simhash_enriches_for_near_dups(spark, sf_dir):
    """SimHash (unweighted, over token sets) is a weaker detector than
    MinHash on this tiny-vocabulary corpus — each differing token flips
    several of the 48 bits. The semantic claim to hold: true near-dups are
    flagged at a rate far above the all-pairs base rate (enrichment), even
    though recall is below MinHash's."""
    lsh = ALL["dedup_minhash_lsh"](spark, sf_dir).toPandas()
    sim = ALL["dedup_simhash"](spark, sf_dir).toPandas()
    sim_pairs = {(r.doc_a, r.doc_b) for r in sim.itertuples()}
    planted = {(r.doc_a, r.doc_b) for r in lsh.itertuples() if r.jaccard >= 0.95}
    assert planted
    n_docs = ALL["text_stats"](spark, sf_dir).count()
    base_rate = len(sim_pairs) / (n_docs * (n_docs - 1) / 2)
    hit_rate = len(planted & sim_pairs) / len(planted)
    assert hit_rate > 0, "simhash found no planted near-dup at all"
    assert hit_rate >= 3 * base_rate, f"no enrichment: hit={hit_rate:.3f} base={base_rate:.3f}"


def test_multimodal_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    assert fake_decode_meta(b"abc") == (3, 3, 21)


def test_dedup_exact_drops_something(spark, sf_dir):
    out = ALL["dedup_exact"](spark, sf_dir).toPandas()
    assert out.n_dropped.sum() > 0, "events fixture should contain (user,type) dups"

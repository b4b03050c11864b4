"""Property fuzzing for the repeated-span family (text_repeated_spans /
text_repeated_spans_trim): both read the corpus through one factored
posting pass (curation._span_postings — stride-1 positional windows,
60-bit md5 keys), so a bug there corrupts the signal AND the budget
accounting simultaneously. The fixed-corpus oracles exercise one
vocabulary; this fuzz pins the semantics on random corpora against a
pure-Python reference:

- signal: n_windows / n_dup_windows per doc, where a window is dup iff
  its exact token content occurs in >= 2 DISTINCT docs (self-repeats
  never mark);
- trim: keep-first at MIN(doc_id) per window content; tokens_cut =
  |union of [i, i+W-1] over this doc's marked windows| (overlap merged,
  never a window-count multiple); n_tokens recovered exactly from the
  posting list; docs shorter than W absent from both outputs.

A 3-word vocabulary makes cross-doc window collisions common at
W-token lengths; each example round-trips a real parquet file because
the operators load through sources.catalog.load_table, mirroring the
registered queries exactly. derandomize keeps CI stable.
"""

from __future__ import annotations

import os
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings, strategies as st

from hyperloglog_pyspark_spark.operators.curation import SPAN_W
from hyperloglog_pyspark_spark.registry import REGISTRY, queries

queries()

_VOCAB = ["a", "b", "c"]


@st.composite
def corpora(draw):
    n = draw(st.integers(2, 6))
    return [
        " ".join(
            draw(
                st.lists(
                    st.sampled_from(_VOCAB),
                    min_size=1,
                    max_size=SPAN_W + 8,
                )
            )
        )
        for _ in range(n)
    ]


def _write_documents(texts, dirpath):
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["fuzz"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(dirpath, "documents.parquet"),
    )


def _reference(texts):
    """Pure-Python replay of both operators' semantics."""
    wins = {}  # doc -> list of (start, content)
    for doc, text in enumerate(texts):
        tk = text.split(" ")
        wins[doc] = [
            (i, " ".join(tk[i : i + SPAN_W]))
            for i in range(len(tk) - SPAN_W + 1)
        ]
    carriers = defaultdict(set)
    for doc, ws in wins.items():
        for _, content in ws:
            carriers[content].add(doc)
    signal, trim = {}, {}
    for doc, ws in wins.items():
        if not ws:
            continue
        n_dup = sum(1 for _, c in ws if len(carriers[c]) >= 2)
        signal[doc] = (len(ws), n_dup)
        cut = set()
        for i, c in ws:
            if len(carriers[c]) >= 2 and doc != min(carriers[c]):
                cut.update(range(i, i + SPAN_W))
        n_tokens = len(texts[doc].split(" "))
        trim[doc] = (n_tokens, len(cut), n_tokens - len(cut))
    return signal, trim


@given(texts=corpora())
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_family_matches_reference(texts, spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spanfuzz"))
    _write_documents(texts, d)
    signal_want, trim_want = _reference(texts)

    got_signal = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in REGISTRY["text_repeated_spans"].fn(spark, d).collect()
    }
    assert got_signal == signal_want

    got_trim = {
        r["doc_id"]: (r["n_tokens"], r["tokens_cut"], r["tokens_kept"])
        for r in REGISTRY["text_repeated_spans_trim"].fn(spark, d).collect()
    }
    assert got_trim == trim_want

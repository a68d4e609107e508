"""Property tests for the pipeline hygiene ops: redaction
idempotence / completeness, decontamination soundness, block-dedup
symmetry — random word-soup corpora, one Spark job per example.
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()

_SETTINGS = settings(max_examples=10, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])

# Word soup in the documents-table style, salted with occasional
# redaction targets and shared runs.
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
          "customer", "supplier", "bob@example.com", "12345678"]
doc_text = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=40) \
    .map(" ".join)


def _write_corpus(spark, texts, sources=None):
    rows = [(i, t, "en", (sources[i] if sources else "src1"), len(t))
            for i, t in enumerate(texts)]
    d = tempfile.mkdtemp(prefix="ordspark_hyg_")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


@_SETTINGS
@given(texts=st.lists(doc_text, min_size=1, max_size=8))
def test_redaction_complete_and_idempotent(spark, texts):
    """After redaction no pattern match survives (completeness), so
    redacting twice changes nothing (idempotence); counts match the
    number of matches removed."""
    d = _write_corpus(spark, texts)
    out = REGISTRY["text_pii_redact"].fn(spark, d).collect()
    for r in out:
        assert "customer" not in r.redacted
        assert "supplier" not in r.redacted
        assert "@" not in r.redacted
        assert "12345678" not in r.redacted
        if r.n_redactions == 0:
            assert r.redacted == texts[r.doc_id]
    # idempotence: run the op over its own output
    d2 = _write_corpus(spark, [r.redacted for r in
                               sorted(out, key=lambda r: r.doc_id)])
    out2 = {r.doc_id: r for r in REGISTRY["text_pii_redact"]
            .fn(spark, d2).collect()}
    for r in out:
        assert out2[r.doc_id].n_redactions == 0
        assert out2[r.doc_id].redacted == r.redacted


@_SETTINGS
@given(texts=st.lists(doc_text, min_size=2, max_size=8))
def test_decontamination_soundness(spark, texts):
    """A corpus doc that IS a benchmark doc verbatim (≥5 tokens) must
    be flagged; flags never fire without a shared 5-token run."""
    # doc 0 is the benchmark; doc 1 is its verbatim copy in the corpus
    sources = ["src0"] + ["src1"] * (len(texts) - 1)
    dup = list(texts)
    dup[1] = texts[0]
    d = _write_corpus(spark, dup, sources)
    out = {r.doc_id: r for r in REGISTRY["text_decontaminate_ngram"]
           .fn(spark, d).collect()}
    n_tokens0 = len(texts[0].split(" "))
    if 1 in out and n_tokens0 >= 5:
        assert out[1].contaminated, (texts[0],)
    # soundness: every flagged doc really shares a 5-gram
    bench_grams = _grams(texts[0], 5)
    for doc_id, r in out.items():
        if r.contaminated:
            assert bench_grams & _grams(dup[doc_id], 5), dup[doc_id]


def _grams(text, w):
    toks = text.split(" ")
    return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}


@_SETTINGS
@given(texts=st.lists(doc_text, min_size=1, max_size=8))
def test_subdoc_blocks_matches_local_model(spark, texts):
    """n_blocks/n_shared_blocks must equal a local reference model
    computed with plain Python sets."""
    d = _write_corpus(spark, texts)
    out = {r.doc_id: r for r in REGISTRY["dedup_subdoc_blocks"]
           .fn(spark, d).collect()}
    blocks = {i: [" ".join(t.split(" ")[b * 8:b * 8 + 8])
                  for b in range(len(t.split(" ")) // 8)]
              for i, t in enumerate(texts)}
    for i, t in enumerate(texts):
        owners = {}
        for j, bl in blocks.items():
            for b in bl:
                owners.setdefault(b, set()).add(j)
        shared = sum(1 for b in blocks[i] if len(owners[b]) > 1)
        assert out[i].n_blocks == len(blocks[i]), i
        assert out[i].n_shared_blocks == shared, i

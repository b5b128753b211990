"""Golden-vector tests for the real BPE tokenizer (operators/bpe.py).

The merge table below is hand-derived for the classic Sennrich-style
fixture corpus (word freqs: low*5 lower*2 newest*3 widest*2):

round 1: (l,o) freq 7 (low+lower)            -> lo
round 2: tie at 5 {(lo,w</w>), (w,e), (e,s), (s,t</w>)};
         lexicographic tie-break             -> (e,s)
round 3: tie at 5 {(es,t</w>), (lo,w</w>)}   -> (es,t</w>)
round 4: (lo,w</w>) freq 5                   -> low</w>
round 5: tie at 3 {(n,e), (e,w), (w,est</w>)} -> (e,w)
round 6: tie at 3 {(ew,est</w>), (n,ew)}      -> (ew,est</w>)
"""

import pytest

from serd_spark.operators.bpe import (
    bpe_encode,
    bpe_token_count,
    make_encoder,
    train_bpe,
)

CORPUS = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 3 + ["widest"] * 2)

GOLDEN_MERGES = [
    ("l", "o"),
    ("e", "s"),
    ("es", "t</w>"),
    ("lo", "w</w>"),
    ("e", "w"),
    ("ew", "est</w>"),
]


def test_train_golden_merges():
    assert train_bpe(CORPUS, n_merges=6) == GOLDEN_MERGES


def test_train_deterministic_any_order():
    import random

    shuffled = CORPUS[:]
    random.Random(7).shuffle(shuffled)
    assert train_bpe(shuffled, n_merges=6) == GOLDEN_MERGES


@pytest.mark.parametrize("word,want", [
    ("low", ["low"]),                 # full-word merge chain
    ("lowest", ["lo", "w", "est"]),   # rank order: (l,o)->(e,s)->(es,t)
    ("newer", ["n", "ew", "e", "r"]),  # (e,w) applies, (w,e) does not
    ("cost", ["c", "o", "s", "t"]),   # no applicable merges
])
def test_encode_golden_vectors(word, want):
    enc = make_encoder(GOLDEN_MERGES)
    assert bpe_encode(word, enc) == want


def test_encode_full_text_and_punct():
    enc = make_encoder(GOLDEN_MERGES)
    # low=1, lower=4 (lo,w,e,r), newest=2 (n,ewest — merge 6 chains)
    assert bpe_encode("low lower newest", enc) == \
        ["low", "lo", "w", "e", "r", "n", "ewest"]
    # case-folded + punctuation pretokens: low/-/c,o,s,t/!
    assert bpe_encode("Low-Cost!", enc) == \
        ["low", "-", "c", "o", "s", "t", "!"]


def test_hapax_pairs_not_memorized():
    # a corpus of all-distinct words has no pair with freq >= 2:
    # training must learn nothing rather than memorize hapaxes
    assert train_bpe(["abc", "def", "ghi"], n_merges=10) == []


@pytest.mark.spark
def test_bpe_token_count_spark(spark):
    """Arrow-batched pandas-UDF path: counts equal the driver-side
    pure-Python encoder on every row (same merges, same pretokens)."""
    from serd_spark.operators.text import bpe_token_count_col

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100)
    # few enough merges that some corpus words stay multi-subword
    # (with enough merges this tiny vocabulary fully merges and the
    # real count degenerates to the pretoken count everywhere)
    merges = train_bpe(
        [r.text for r in docs.select("text").collect()], n_merges=25)
    got = {r.doc_id: r.bpe_tokens_real
           for r in bpe_token_count(docs, merges).collect()}
    enc = make_encoder(merges)
    want = {r.doc_id: len(bpe_encode(r.text, enc))
            for r in docs.collect()}
    assert got == want and got

    # and the real counts differ from the regex stand-in somewhere:
    # the stand-in counts pretokens = the all-words-fully-merged LOWER
    # bound; BPE splits not-fully-merged words into several subwords
    from pyspark.sql import functions as F

    approx = {r.doc_id: r.n for r in docs.select(
        "doc_id", bpe_token_count_col(F.col("text")).alias("n")).collect()}
    assert all(got[k] >= approx[k] for k in got)
    assert any(got[k] > approx[k] for k in got)


@pytest.mark.spark
def test_bpe_fixture_merges_contract(spark):
    """The committed fixture merges table (the bpe_tokens_real
    contract query's vocabulary) loads, is non-trivial, and the Spark
    counts over it equal the driver-side encoder."""
    from serd_spark.operators.bpe import fixture_merges

    merges = fixture_merges()
    assert len(merges) > 50
    assert all(isinstance(m, tuple) and len(m) == 2 for m in merges)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {r.doc_id: r.bpe_tokens_real
           for r in bpe_token_count(docs, merges).collect()}
    enc = make_encoder(merges)
    want = {r.doc_id: len(bpe_encode(r.text, enc))
            for r in docs.collect()}
    assert got == want and got

"""Property-based tests for the round-3 operators' pure-Python cores
(no Spark session: fast, wide input coverage via hypothesis)."""

import re

import hypothesis.strategies as st
from hypothesis import given, settings

from serd_spark.operators.bpe import bpe_encode, make_encoder, train_bpe
from serd_spark.operators.kg import AhoCorasick

_alpha = st.text(alphabet="abcd", min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(
    patterns=st.lists(_alpha, min_size=1, max_size=8, unique=True),
    text=st.text(alphabet="abcd ", max_size=60),
)
def test_aho_corasick_equals_bruteforce(patterns, text):
    """AC over a tiny alphabet (maximizes overlaps, nested patterns,
    self-overlapping patterns like 'aa') == per-pattern lookahead
    regex scan, for every generated dictionary and text."""
    ac = AhoCorasick(sorted(patterns))
    got = sorted(ac.finditer(text))
    want = sorted(
        (m.start(), p)
        for p in patterns
        for m in re.finditer("(?=" + re.escape(p) + ")", text))
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    corpus=st.lists(st.text(alphabet="abcde", min_size=1, max_size=8),
                    min_size=1, max_size=30),
    n_merges=st.integers(min_value=0, max_value=30),
)
def test_bpe_roundtrip_properties(corpus, n_merges):
    """For any corpus/merge budget: (1) training is deterministic,
    (2) encoding any corpus word concatenates back to the word,
    (3) token count never exceeds the character count."""
    merges = train_bpe(corpus, n_merges=n_merges)
    assert merges == train_bpe(list(corpus), n_merges=n_merges)
    enc = make_encoder(merges)
    for w in corpus:
        toks = bpe_encode(w, enc)
        assert "".join(toks) == w.lower()
        assert 1 <= len(toks) <= len(w)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=5),
                min_size=2, max_size=20))
def test_bpe_merges_monotone_under_budget(corpus):
    """A larger merge budget yields a merges list that EXTENDS the
    smaller budget's list (training is greedy and prefix-stable)."""
    m_small = train_bpe(corpus, n_merges=3)
    m_large = train_bpe(corpus, n_merges=10)
    assert m_large[:len(m_small)] == m_small

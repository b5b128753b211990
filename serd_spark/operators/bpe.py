"""Deterministic byte-pair-encoding tokenizer (the REAL token
counter for training-data budgeting — ``text.bpe_token_count_col`` is
the cheap JVM regex approximation; this module applies an actual
merges table).

Design for Spark:

- the merges table is tiny (hundreds to tens of thousands of entries)
  and immutable — it ships to executors once per task batch inside the
  pandas-UDF closure (Spark pickles it with the function; for very
  large vocabularies use ``SparkContext.broadcast`` the same way);
- encoding is a pure function of (text, merges) — deterministic under
  retries, no state;
- the hot path is Arrow-batched (``mapInPandas``/``pandas_udf``), one
  Python call per ~10k rows, with an LRU cache per distinct word —
  Zipfian text makes the cache hit rate very high, so per-row work is
  a dict lookup for all but the tail.

Training (``train_bpe``) is the classic algorithm (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):
count adjacent symbol pairs over the word frequency table, repeatedly
merge the most frequent pair (ties broken lexicographically so the
table is reproducible), stop after ``n_merges``.  It runs driver-side
on a sample/fixture corpus — training the vocabulary is a one-off
offline step in a real pipeline, not a per-query stage.
"""

# NOTE: no `from __future__ import annotations` here — it stringifies
# the pandas-UDF type hints, which PySpark resolves at decoration time
# to pick the eval type.

import re
from collections import Counter
from functools import lru_cache

import pandas as pd

# Same pre-tokenization as the JVM regex approximation
# (text.BPE_TOKEN_RE): words / numbers / single punctuation.
PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

END = "</w>"  # end-of-word marker: lets merges distinguish suffixes


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END,)


def train_bpe(texts, n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn a merges table from an iterable of texts.  Deterministic:
    the most frequent adjacent pair wins each round, ties broken by
    lexicographic pair order."""
    vocab = Counter()
    for t in texts:
        for w in PRETOKEN_RE.findall(t.lower()):
            vocab[_word_symbols(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], _neg_lex(kv[0])))
        pair, freq = best
        if freq < 2:
            break  # merging hapax pairs just memorizes the corpus
        merges.append(pair)
        vocab = Counter(
            {_merge_syms(syms, pair): n for syms, n in vocab.items()})
    return merges


class _neg_lex:
    """Order-reversing wrapper so max() picks the lexicographically
    SMALLEST pair among frequency ties (reproducible tie-break)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return self.v > other.v

    def __eq__(self, other):
        return self.v == other.v


def _merge_syms(syms: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def make_encoder(merges: list[tuple[str, str]], cache_size: int = 65536):
    """Build ``encode_word(word) -> tuple[str, ...]`` applying merges
    in rank order (lowest-rank pair present merges first — the
    standard BPE inference loop), LRU-cached per distinct word."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @lru_cache(maxsize=cache_size)
    def encode_word(word: str) -> tuple:
        syms = _word_symbols(word)
        while len(syms) > 1:
            ranked = [
                (ranks[p], p)
                for p in zip(syms, syms[1:]) if p in ranks
            ]
            if not ranked:
                break
            syms = _merge_syms(syms, min(ranked)[1])
        return syms

    return encode_word


def bpe_encode(text: str, encode_word) -> list[str]:
    """Tokenize a text: pre-tokenize, BPE-encode each word, strip the
    end-of-word marker from the emitted subwords."""
    out: list[str] = []
    for w in PRETOKEN_RE.findall(text.lower()):
        out.extend(
            s[:-len(END)] if s.endswith(END) else s
            for s in encode_word(w))
    return out


def fixture_merges() -> list[tuple[str, str]]:
    """The committed fixture merges table
    (``serd_spark/fixtures/bpe_merges.json``, trained offline with
    :func:`train_bpe` over the sf0.001 documents corpus; the hapax
    cutoff stopped it at 93 merges).  It backs the ``bpe_tokens_real``
    contract query — a real pipeline loads its production tokenizer's
    merges the same way (a small immutable artifact shipped with the
    job, never recomputed per run)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "fixtures", "bpe_merges.json")
    with open(path) as f:
        return [tuple(m) for m in json.load(f)]


def bpe_token_count(docs, merges: list[tuple[str, str]],
                    text_col: str = "text"):
    """(doc_id, bpe_tokens_real) via an Arrow-batched pandas UDF —
    the merges table rides the UDF closure (tiny, immutable).  The
    regex approximation (``text.bpe_token_count_col``) stays the
    zero-Python fast path; use this when budgets must reflect real
    merge behavior."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    merges_t = [tuple(m) for m in merges]

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        enc = make_encoder(merges_t)
        return texts.map(
            lambda t: len(bpe_encode(t, enc)) if t is not None else 0)

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _count(F.col(text_col)).alias("bpe_tokens_real"),
    )

"""Byte-exact serdi output parity.

- 'pretty' suite: every file read and rewritten in the same syntax
  reproduces itself byte-for-byte (reference test/extra/pretty/README).
- 'perfect' suite: ttl → canonical NT (serdi ASCII style) equals the
  golden .nt byte-for-byte (perfect_forward), and NT → pretty Turtle
  equals the golden .ttl byte-for-byte (perfect_reverse;
  reference test/meson.build:254-262).
"""

import os

import pytest

from serd_spark.suites import REFERENCE_TEST_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TEST_DIR),
    reason="reference test corpus not available",
)

PRETTY = os.path.join(REFERENCE_TEST_DIR, "extra/pretty")
PERFECT = os.path.join(REFERENCE_TEST_DIR, "extra/perfect")
NS = "http://drobilla.net/sw/serd/test/"


def _inputs(d, exts):
    return sorted(
        n for n in os.listdir(d)
        if n.endswith(exts) and not n.startswith("manifest")
    )


def test_pretty_suite_byte_exact():
    from serd_spark.writer_serdi import pretty_print

    n_checked = 0
    for name in _inputs(PRETTY, (".ttl", ".trig")):
        raw = open(os.path.join(PRETTY, name), "rb").read()
        out = pretty_print(raw, base_uri=NS + "pretty/" + name,
                           trig=name.endswith(".trig"))
        assert out == raw.decode("utf-8"), name
        n_checked += 1
    assert n_checked >= 38


def _perfect_pairs():
    pairs = {}
    for n in os.listdir(PERFECT):
        if n.endswith(".ttl") and not n.startswith("manifest"):
            pairs.setdefault(n[:-4], {})["ttl"] = n
        elif n.endswith(".nt"):
            pairs.setdefault(n[:-3], {})["nt"] = n
    return {k: v for k, v in pairs.items() if len(v) == 2}


def test_perfect_forward_byte_exact():
    """ttl → serdi-style ASCII NTriples, byte-equal to golden."""
    from serd_spark.turtle import parse_turtle
    from serd_spark.writer import format_statement

    pairs = _perfect_pairs()
    assert len(pairs) >= 18
    for stem, p in sorted(pairs.items()):
        ttl = open(os.path.join(PERFECT, p["ttl"]), "rb").read()
        want = open(os.path.join(PERFECT, p["nt"]), "rb").read().decode()
        triples, errs = parse_turtle(
            ttl, base_uri=NS + "perfect/" + p["ttl"])
        assert not errs, (stem, errs[:2])
        got = "".join(format_statement(t, ascii_=True) + "\n"
                      for t in triples)
        assert got == want, stem


def test_perfect_reverse_byte_exact():
    """NT → pretty Turtle, byte-equal to the golden .ttl."""
    from serd_spark.writer_serdi import pretty_print

    pairs = _perfect_pairs()
    for stem, p in sorted(pairs.items()):
        nt = open(os.path.join(PERFECT, p["nt"]), "rb").read()
        want = open(os.path.join(PERFECT, p["ttl"]), "rb").read().decode()
        got = pretty_print(nt, base_uri=NS + "perfect/" + p["nt"])
        assert got == want, stem


def test_event_stream_matches_triples():
    """The event stream's statements are exactly the parser's triples
    (same order — serd emits parent-before-body; EventParser's triples
    follow the same order by construction)."""
    from serd_spark.writer_serdi import EventParser

    doc = (
        "@prefix eg: <http://example.org/> .\n"
        "eg:s eg:p (1 2 [ eg:q eg:o ]) ; eg:r [] .\n"
    )
    p = EventParser(doc, base_uri="http://base/")
    triples, errors = p.parse()
    assert not errors
    stmts = [e for e in p.events if e[0] == "stmt"]
    assert len(stmts) == len(triples)
    ends = [e for e in p.events if e[0] == "end"]
    assert len(ends) == 1  # one non-empty anon

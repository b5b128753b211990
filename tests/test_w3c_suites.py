"""Conformance gate: run the vendored W3C + serd-extra suites through
the parsers and require P/R ≥ 0.95 (BASELINE.md target; we hold 1.0).

Suite corpora are public W3C test data vendored in the read-only
reference checkout; discovery/semantics in serd_spark.suites.
"""

import os

import pytest

from serd_spark.suites import REFERENCE_TEST_DIR, SUITES, score_suite

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TEST_DIR),
    reason="reference test corpus not available",
)


@pytest.mark.parametrize("suite", ["ntriples", "nquads", "turtle", "trig",
                                   "good", "big", "bad", "eof"])
def test_suite_conformance(suite):
    r = score_suite(suite)
    assert r["total"] > 0
    # Hard gate: every test passes (we currently hold 100%).
    assert r["passed"] == r["total"], r["failed"][:10]
    # Soft gate mirrored from BASELINE.json: P/R ≥ 0.95 on eval triples.
    if r["want"]:
        assert r["precision"] >= 0.95
        assert r["recall"] >= 0.95


def test_lax_suite():
    """Serd lax suite (run_suite.py --lax semantics): strict parse
    must reject each input; lax parse must emit exactly the golden
    triples (U+FFFD repair, control-char IRIs, out-of-range escapes)."""
    from serd_spark.suites import score_lax_suite

    r = score_lax_suite()
    assert r["total"] > 0
    assert r["passed"] == r["total"], r["failed"][:10]


def test_eof_suite_lax_recovers():
    """eof_lax suite analogue: truncated inputs must not crash the lax
    reader (errors are quarantined, never raised)."""
    from serd_spark.suites import discover, run_test

    for t in discover("eof"):
        run_test(t, lax=True)  # must not raise


def test_roundtrip_fixpoint():
    """Perfect-suite analogue: parse → write canonical NQuads →
    re-parse → identical multiset (lossless round-trip)."""
    from serd_spark.compare import isomorphic
    from serd_spark.ntriples import parse_ntriples
    from serd_spark.suites import discover, parse_golden, run_test
    from serd_spark.writer import format_statement

    n_checked = 0
    for t in discover("turtle"):
        if t.kind != "eval":
            continue
        triples, errors = run_test(t)
        assert not errors, (t.name, errors[:2])
        text = "\n".join(format_statement(x) for x in triples)
        reparsed, rerrors = parse_ntriples(text, nquads=True)
        assert not rerrors, (t.name, rerrors[:2])
        assert isomorphic(reparsed, triples), t.name
        n_checked += 1
    assert n_checked > 100

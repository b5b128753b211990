"""Property-based round-trip tests (hypothesis): arbitrary unicode
triples survive write→parse for both writers, bit-exactly.

This stresses the escaping tables (O-25) and the abbreviating writer's
state machine far beyond the golden suites' character coverage.
"""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from serd_spark.compare import isomorphic
from serd_spark.nodes import BLANK, LITERAL, NS_XSD, URI, Triple
from serd_spark.ntriples import parse_ntriples
from serd_spark.turtle import parse_turtle
from serd_spark.writer import format_statement

# surrogates can't round-trip UTF-8; everything else is fair game
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)

# Labels shaped like genids ('b<digit>…'/'B<digit>…') are excluded:
# the reader's clash-avoidance rename (n3.c:885-898 parity) folds
# 'b0' into 'B0' by design, so such labels are not round-trip-stable
# without a blank prefix — which is exactly why the pipeline salts
# blanks with the conv id.
_safe_label = st.from_regex(
    r"[A-Za-z](?:[A-Za-z][A-Za-z0-9]{0,7})?", fullmatch=True)

# IRIs: absolute, arbitrary non-forbidden chars in the tail
_iri_tail = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
        blacklist_characters='<>"{}|^`\\' + "".join(
            chr(c) for c in range(0x21))),
    max_size=20)
_iri = st.builds(lambda t: "http://example.org/" + t, _iri_tail)

_lang = st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,6})?", fullmatch=True)


def _mk_literal(value, dt_or_lang):
    if dt_or_lang is None:
        return (value, LITERAL, None, None)
    if dt_or_lang.startswith("@"):
        return (value, LITERAL, None, dt_or_lang[1:])
    return (value, LITERAL, dt_or_lang, None)


_object = st.one_of(
    st.builds(lambda v: (v, URI, None, None), _iri),
    st.builds(lambda b: (b, BLANK, None, None), _safe_label),
    st.builds(
        _mk_literal,
        _text,
        st.one_of(
            st.none(),
            st.builds(lambda l: "@" + l, _lang),
            st.just(NS_XSD + "string"),
            _iri,
        ),
    ),
)

_subject = st.one_of(
    st.builds(lambda v: (v, URI), _iri),
    st.builds(lambda b: (b, BLANK), _safe_label),
)

_triple = st.builds(
    lambda s, p, o: Triple(None, s[0], s[1], p, o[0], o[1], o[2], o[3]),
    _subject, _iri, _object)

_triples = st.lists(_triple, min_size=1, max_size=12)


def _tkey(t):
    """None-safe multiset sort key: Triple fields may be None or str
    (e.g. two triples identical except o_datatype None vs xsd:string),
    and Python can't order those directly."""
    return tuple(("", "") if v is None else ("v", str(v)) for v in t)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_triples)
def test_nquads_roundtrip_fixpoint(triples):
    """format → parse → identical triples (multiset), both escape
    modes."""
    for ascii_ in (False, True):
        text = "\n".join(format_statement(t, ascii_=ascii_)
                         for t in triples)
        got, errors = parse_ntriples(text, nquads=True)
        assert not errors, errors[:2]
        assert sorted(got, key=_tkey) == sorted(triples, key=_tkey)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_triples)
def test_serdi_writer_roundtrip(triples):
    """flat triples → abbreviating writer → Turtle parse → isomorphic
    multiset (labels may be salted, hence bijection compare)."""
    from serd_spark.writer_serdi import events_from_triples, write_events

    text = write_events(events_from_triples(triples),
                        base_uri="http://base.example/doc")
    got, errors = parse_turtle(text, base_uri="http://base.example/doc")
    assert not errors, (errors[:2], text[:200])
    assert isomorphic(got, list(triples)), text[:300]

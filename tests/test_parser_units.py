"""Unit tests for the Turtle/TriG/NTriples parsers — edge cases from
the reference's observable semantics (numbers, blanks, directives,
collections, lax recovery)."""

import pytest

from serd_spark.nodes import (
    BLANK,
    LITERAL,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    URI,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
)
from serd_spark.ntriples import parse_nt_line, parse_ntriples
from serd_spark.turtle import parse_turtle

B = "http://example.org/"


def tt(doc, **kw):
    triples, errors = parse_turtle(doc, base_uri=B, **kw)
    assert not errors, errors
    return triples


def one(doc, **kw):
    ts = tt(doc, **kw)
    assert len(ts) == 1
    return ts[0]


class TestNumbers:
    @pytest.mark.parametrize(
        "lex,dt",
        [
            ("1", XSD_INTEGER), ("-5", XSD_INTEGER), ("+42", XSD_INTEGER),
            ("1.5", XSD_DECIMAL), (".5", XSD_DECIMAL), ("-.5", XSD_DECIMAL),
            ("1e0", XSD_DOUBLE), ("1E-3", XSD_DOUBLE), ("1.2e9", XSD_DOUBLE),
            ("123.E+1", XSD_DOUBLE), (".5e0", XSD_DOUBLE),
        ],
    )
    def test_lexical_preserved(self, lex, dt):
        t = one(f"<s> <p> {lex} .")
        assert t.o == lex  # lexical form verbatim (n3.c:700-758)
        assert t.o_datatype == dt

    def test_trailing_dot_is_terminator(self):
        # '2.' = integer 2 then end of statement (n3.c:726-737)
        t = one("<s> <p> 2.")
        assert (t.o, t.o_datatype) == ("2", XSD_INTEGER)

    def test_booleans(self):
        ts = tt("<s> <p> true, false .")
        assert [(t.o, t.o_datatype) for t in ts] == [
            ("true", XSD_BOOLEAN), ("false", XSD_BOOLEAN)]


class TestBlanks:
    def test_genid_deterministic(self):
        ts = tt("<s> <p> [ <q> <o> ] , [ <q> <o> ] .")
        blanks = [t.o for t in ts if t.o_type == BLANK]
        assert blanks == ["b1", "b2"]

    def test_blank_prefix_salt(self):
        ts = tt("_:x <p> [ ] .", blank_prefix="c42_")
        assert ts[0].s == "c42_x"
        assert ts[0].o == "c42_b1"

    def test_b_digit_clash_relabels(self):
        # user '_:b1' → 'B1' so genids can't collide (n3.c:885-898)
        ts = tt("_:b1 <p> <o> .")
        assert ts[0].s == "B1"

    def test_b_then_B_clash_errors(self):
        _, errors = parse_turtle("_:b1 <p> _:B1 .", base_uri=B)
        assert errors

    def test_anon_subject_bare(self):
        ts = tt("[ <p> <o> ] .")
        assert ts[0].s == "b1" and ts[0].s_type == BLANK


class TestCollections:
    def test_empty_is_nil(self):
        t = one("<s> <p> () .")
        assert (t.o, t.o_type) == (RDF_NIL, URI)

    def test_desugaring(self):
        ts = tt("<s> <p> (1 2) .")
        # s p b1; b1 first 1; b1 rest b2; b2 first 2; b2 rest nil
        assert len(ts) == 5
        preds = sorted(t.p for t in ts)
        assert preds.count(RDF_FIRST) == 2
        assert preds.count(RDF_REST) == 2
        nil_rest = [t for t in ts if t.p == RDF_REST and t.o == RDF_NIL]
        assert len(nil_rest) == 1


class TestDirectives:
    def test_prefix_reassignment_mid_doc(self):
        ts = tt("@prefix p: <http://one/> . p:s <p> p:o .\n"
                "@prefix p: <http://two/> . p:s2 <p> p:o2 .")
        assert ts[0].s == "http://one/s"
        assert ts[1].s == "http://two/s2"

    def test_sparql_style_case_insensitive_no_dot(self):
        ts = tt("PrEfIx p: <http://x/>\nBaSe <http://b/>\np:s <rel> p:o .")
        assert ts[0].s == "http://x/s"
        assert ts[0].p == "http://b/rel"

    def test_at_directives_lowercase_only(self):
        _, errors = parse_turtle("@BASE <http://x/> .", base_uri=B)
        assert errors

    def test_undefined_prefix_errors(self):
        _, errors = parse_turtle("x:s <p> <o> .", base_uri=B)
        assert errors

    def test_rdf_type_a(self):
        t = one("<s> a <C> .")
        assert t.p == RDF_TYPE


class TestFanout:
    def test_predicate_object_lists(self):
        ts = tt("<s> <p1> <o1>, <o2> ; <p2> <o3> .")
        assert len(ts) == 3
        assert {(t.p, t.o) for t in ts} == {
            (B + "p1", B + "o1"), (B + "p1", B + "o2"), (B + "p2", B + "o3")}


class TestLiterals:
    def test_escapes(self):
        t = one(r'<s> <p> "a\tb\nc\"d\\e" .')
        assert t.o == 'a\tb\nc"d\\e'

    def test_uchar(self):
        t = one(r'<s> <p> "é\U0001F600" .')
        assert t.o == "é😀"

    def test_long_string_quotes(self):
        t = one('<s> <p> """say "hi" twice""" .')
        assert t.o == 'say "hi" twice'

    def test_lang_and_datatype(self):
        ts = tt('<s> <p> "x"@en-GB, "y"^^<http://dt> .')
        assert ts[0].o_lang == "en-GB" and ts[0].o_datatype is None
        assert ts[1].o_datatype == "http://dt" and ts[1].o_lang is None

    def test_single_quotes(self):
        t = one("<s> <p> 'hi' .")
        assert t.o == "hi"


class TestLaxMode:
    def test_lax_recovers_skipping_line(self):
        doc = "<s> <p> <o> .\n<s <broken\n<s2> <p2> <o2> .\n"
        triples, errors = parse_turtle(doc, base_uri=B, lax=True)
        assert len(errors) == 1
        assert len(triples) == 2

    def test_strict_stops(self):
        doc = "<s> <p> <o> .\n<s <broken\n<s2> <p2> <o2> .\n"
        triples, errors = parse_turtle(doc, base_uri=B, lax=False)
        assert len(errors) == 1
        assert len(triples) == 1


class TestNTriples:
    def test_minimal_whitespace(self):
        t = parse_nt_line("<http://a/s><http://a/p><http://a/o>.")
        assert t.s == "http://a/s"

    def test_graph_term(self):
        t = parse_nt_line('<http://a/s> <http://a/p> "o" <http://a/g> .')
        assert t.g == "http://a/g"

    def test_relative_iri_rejected(self):
        _, errors = parse_ntriples("<s> <http://a/p> <http://a/o> .")
        assert errors

    def test_lax_quarantine(self):
        text = "<http://a/s> <http://a/p> <http://a/o> .\njunk\n" \
               "<http://a/s2> <http://a/p> <http://a/o> ."
        triples, errors = parse_ntriples(text, lax=True)
        assert len(triples) == 2 and len(errors) == 1


class TestTriG:
    def test_wrapped_and_labeled_graphs(self):
        doc = ("@prefix p: <http://x/> .\n"
               "{ <s> <p> <o> }\n"
               "p:g1 { <s> <p> <o> . }\n"
               "GRAPH <g2> { <s> <p> <o> }\n")
        ts = tt(doc, trig=True)
        assert [t.g for t in ts] == [None, "http://x/g1", B + "g2"]

    def test_blank_graph_label(self):
        ts = tt("_:g { <s> <p> <o> }", trig=True)
        assert ts[0].g == "_:g"

    def test_default_graph_injection(self):
        ts = tt("<s> <p> <o> .", default_graph="http://dg/")
        assert ts[0].g == "http://dg/"


class TestPnLocalPlx:
    """Dot-run followed by a PLX escape stays inside the local name
    (Turtle PN_LOCAL grammar: dots are valid mid-name when followed by
    PN_CHARS | ':' | PLX).  Regression for the fast-path guard that
    only inspected the single char after the regex match."""

    def test_dot_then_percent(self):
        ts = tt("@prefix p: <http://ex/> . p:s <q> p:a.%41 .")
        assert len(ts) == 1
        assert ts[0].o == "http://ex/a.%41"

    def test_dot_then_backslash_escape(self):
        ts = tt("@prefix p: <http://ex/> . p:s <q> p:a.\\~ .")
        assert len(ts) == 1
        assert ts[0].o == "http://ex/a.~"

    def test_dotrun_then_percent(self):
        ts = tt("@prefix p: <http://ex/> . p:s <q> p:a..%41 .")
        assert ts[0].o == "http://ex/a..%41"

    def test_trailing_dot_still_terminates(self):
        ts = tt("@prefix p: <http://ex/> . p:s <q> p:a.")
        assert ts[0].o == "http://ex/a"


class TestLaxSurrogates:
    """Lax repair must never emit lone surrogates — they crash any
    later plain-UTF-8 encode (sinks, Spark string columns)."""

    def test_uchar_surrogate_lax_is_replacement(self):
        from serd_spark.escapes import decode_uchar
        assert decode_uchar("D800", lax=True) == "�"
        assert decode_uchar("DFFF", lax=True) == "�"

    def test_uchar_surrogate_strict_raises(self):
        from serd_spark.escapes import EscapeError, decode_uchar
        with pytest.raises(EscapeError):
            decode_uchar("D800")

    def test_lax_utf8_surrogate_bytes_replaced(self):
        from serd_spark.chars import lax_utf8_decode
        # UTF-8-encoded surrogate U+D800 (structurally valid 3-byte seq)
        out = lax_utf8_decode(b"a\xed\xa0\x80b")
        assert out == "a�b"
        out.encode("utf-8")  # must not raise

    def test_lax_parse_output_always_encodable(self):
        doc = '<s> <p> "\\uD800 tail" .'
        triples, errors = parse_turtle(doc, base_uri=B, lax=True)
        for t in triples:
            t.o.encode("utf-8")  # must not raise

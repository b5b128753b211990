"""serdi flag-variant suites, byte-exact (reference test/meson.build):

- qualify: URIs shortened into CURIEs against in-document prefixes
  (O-21 + write_lname escaping) — `serdi -i turtle -o turtle`.
- root: relative serialization bounded by `-r` root (O-22).
- abbreviate: flat NTriples/NQuads → elided Turtle/TriG (`-o turtle`).
- prefix: add (`-p test`) / chop (`-c test`) blank-label prefixes
  (O-13 salt / O-29 chop).
"""

import os

import pytest

from serd_spark.suites import REFERENCE_TEST_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TEST_DIR),
    reason="reference test corpus not available",
)

EXTRA = os.path.join(REFERENCE_TEST_DIR, "extra")
NS = "http://drobilla.net/sw/serd/test/"


def _read(suite, name):
    return open(os.path.join(EXTRA, suite, name), "rb").read()


def test_qualify_suite():
    from serd_spark.writer_serdi import pretty_print

    got = pretty_print(_read("qualify", "qualify-in.ttl"),
                       base_uri=NS + "qualify/qualify-in.ttl")
    assert got == _read("qualify", "qualify-out.ttl").decode()


@pytest.mark.parametrize("stem", ["root-inside-base", "root-outside-base"])
def test_root_suite(stem):
    from serd_spark.writer_serdi import pretty_print

    got = pretty_print(
        _read("root", stem + "-in.ttl"),
        base_uri=NS + f"root/{stem}-in.ttl",
        root_uri="http://example.org/top/root/",
    )
    assert got == _read("root", stem + "-out.ttl").decode()


@pytest.mark.parametrize("stem,in_ext,out_ext", [
    ("collapse-subjects", ".nt", ".ttl"),
    ("collapse-predicates", ".nt", ".ttl"),
    ("collapse-graphs", ".nq", ".trig"),
])
def test_abbreviate_suite(stem, in_ext, out_ext):
    """Flat input has no anon/list context: blanks print as labels,
    only S/P elision applies (abbreviate suite README)."""
    from serd_spark.ntriples import parse_ntriples
    from serd_spark.writer_serdi import events_from_triples, write_events

    triples, errors = parse_ntriples(
        _read("abbreviate", stem + in_ext), nquads=(in_ext == ".nq"))
    assert not errors
    got = write_events(
        events_from_triples(triples),
        syntax="trig" if out_ext == ".trig" else "turtle",
        base_uri=NS + "abbreviate/" + stem + in_ext,
    )
    assert got == _read("abbreviate", stem + out_ext).decode(), stem


def test_prefix_remove():
    """ttl with 'test…' blank labels → NT with the prefix chopped
    (`-c test`, writer.c:1279-1295)."""
    from serd_spark.turtle import parse_turtle
    from serd_spark.writer import format_statement

    triples, errors = parse_turtle(
        _read("prefix", "remove-prefixes.ttl"),
        base_uri=NS + "prefix/remove-prefixes.ttl")
    assert not errors

    def chop(t):
        s = t.s[4:] if t.s_type == 4 and t.s.startswith("test") else t.s
        o = t.o[4:] if t.o_type == 4 and t.o.startswith("test") else t.o
        return t._replace(s=s, o=o)

    got = "".join(format_statement(chop(t), ascii_=True) + "\n"
                  for t in triples)
    assert got == _read("prefix", "remove-prefixes.nt").decode()


def test_prefix_add():
    """NT with bare labels + reader blank prefix 'test' (`-p test`,
    reader.c:281-296) → pretty Turtle with prefixed labels.  NTriples
    input is not 'fancy syntax', so the b→B genid-clash rename does
    NOT apply (n3.c:886 fancy_syntax guard) — hence the NT parser."""
    from serd_spark.ntriples import parse_ntriples
    from serd_spark.writer_serdi import events_from_triples, write_events

    triples, errors = parse_ntriples(
        _read("prefix", "remove-prefixes.nt"), nquads=False,
        blank_prefix="test")
    assert not errors
    got = write_events(events_from_triples(triples),
                       base_uri=NS + "prefix/remove-prefixes.nt")
    assert got == _read("prefix", "remove-prefixes.ttl").decode()


def test_full_suite_fast_mode():
    """`serdi -f` (full URIs): qualification off, resolution on —
    full-uris.ttl reproduces itself byte-exactly while containing an
    IRI that WOULD qualify under its own prefix."""
    from serd_spark.writer_serdi import pretty_print

    raw = _read("full", "full-uris.ttl")
    got = pretty_print(raw, base_uri=NS + "full/full-uris.ttl",
                       qualify=False)
    assert got == raw.decode()
    # sanity: default mode DOES qualify (different output)
    assert pretty_print(raw, base_uri=NS + "full/full-uris.ttl") \
        != raw.decode()

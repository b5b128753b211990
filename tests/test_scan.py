"""fast_scan_directives must agree exactly with the full-grammar
scan (TurtleParser scan_only) — it feeds the chunked Env fold."""

from serd_spark.scan import fast_scan_directives
from serd_spark.suites import discover
from serd_spark.transcripts import gen_local
from serd_spark.turtle import scan_directives


def test_matches_full_scan_on_corpus():
    rows = gen_local(60, mega_every=10, mega_factor=10)
    docs = {}
    for r in rows:
        docs.setdefault(r[0], []).append(r[3])
    for cid, texts in docs.items():
        text = "\n".join(texts)
        assert scan_directives(text) == fast_scan_directives(text), cid


def test_matches_full_scan_on_w3c():
    n = 0
    for t in discover("turtle") + discover("trig") + discover("good"):
        if t.kind == "negative":
            continue
        text = t.read_text()
        assert scan_directives(text, trig=(t.syntax == "trig")) \
            == fast_scan_directives(text), t.name
        n += 1
    assert n > 400


def test_tricky_contexts():
    text = (
        '<http://s> <http://p> "not @prefix x: <http://no/> ." .\n'
        "# @base <http://no/> .\n"
        "@prefix real: <http://yes/> .\n"
        "<http://s> <http://p> '''multi\n@prefix fake: <http://no/> .\n''' .\n"
        "PREFIX sp: <http://sparql/>\n"
        "<http://s> <http://p> <http://o#@prefix> .\n"
    )
    got = fast_scan_directives(text)
    assert got == [("prefix", "real", "http://yes/"),
                   ("prefix", "sp", "http://sparql/")]
    assert got == scan_directives(text)

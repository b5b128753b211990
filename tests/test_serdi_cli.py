"""serdi CLI surface — mirrors the reference's command-line tests
(test/meson.build:55-153): bad-option handling, --help/--version,
string/stdin input, bad-input failures, and quiet mode."""

import io
import os

import pytest

from serd_spark.serdi import main

REF = "/root/reference"


def run(*args, stdin_text=""):
    out, err = io.StringIO(), io.StringIO()
    rc = main(["serdi", *args], out=out, err=err,
              stdin=io.StringIO(stdin_text))
    return rc, out.getvalue(), err.getvalue()


BAD_OPTIONS = [
    ["-c"], ["-cx"], ["-fi"], ["-i", "turtle"], ["-i", "turt"],
    ["-i"], ["-ix"], ["-o", "~unknown"], ["-o", "ntripleses"],
    ["-o"], ["-ox"], ["-p"], ["-px"], ["-r"], ["-rx"], ["-z"],
]


@pytest.mark.parametrize("args", BAD_OPTIONS,
                         ids=["_".join(a) for a in BAD_OPTIONS])
def test_bad_options_fail(args):
    rc, _out, err = run(*args)
    assert rc == 1
    assert err  # an error message, not silence


GOOD_OPTIONS = [
    ["--help"], ["--version"], ["-h"], ["-s", "<go:>a<go:> ."], ["-v"],
]


@pytest.mark.parametrize("args", GOOD_OPTIONS,
                         ids=["_".join(a) for a in GOOD_OPTIONS])
def test_good_options_succeed(args):
    rc, out, _err = run(*args)
    assert rc == 0
    assert out


def test_no_args_fails():
    rc, _out, err = run()
    assert rc == 1 and "missing input" in err


def test_string_input_converts():
    rc, out, _ = run("-s", "<go:>a<go:> .")
    assert rc == 0
    assert out == ("<go:> <http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                   "type> <go:> .\n")


def test_stdin_input():
    rc, out, _ = run("-i", "turtle", "-",
                     stdin_text="<http://a/s> <http://a/p> <http://a/o> .")
    assert rc == 0
    assert out == "<http://a/s> <http://a/p> <http://a/o> .\n"


@pytest.mark.parametrize("args", [
    ["-s", "<foo> a <Bar> ."],            # relative IRI, no base
    ["no_such_file"],
    ["ftp://example.org/unsupported.ttl"],
], ids=["bad_string", "no_such_file", "remote"])
def test_bad_inputs_fail(args):
    rc, _out, err = run(*args)
    assert rc == 1 and err


def test_read_dir_fails():
    rc, _out, err = run("/root/repo/serd_spark")
    assert rc == 1 and err


def test_quiet_suppresses_errors_keeps_status():
    bad = os.path.join(REF, "test", "extra", "bad", "bad-base.ttl")
    if not os.path.exists(bad):
        pytest.skip("reference corpus not available")
    rc, out, err = run("-q", bad)
    assert rc == 1
    assert err == "" and out == ""
    rc2, _out2, err2 = run(bad)
    assert rc2 == 1 and err2


def test_serd_ttl_parses():
    """`test('serd_ttl', serdi, args: [serd_ttl])` — the project's own
    ontology must convert cleanly."""
    ttl = os.path.join(REF, "serd.ttl")
    if not os.path.exists(ttl):
        pytest.skip("reference corpus not available")
    rc, out, err = run(ttl)
    assert rc == 0 and err == ""
    assert out.count("\n") == 24  # serd.ttl: 24 statements


def test_lax_continues_strict_stops(tmp_path):
    p = tmp_path / "mixed.ttl"
    # NB: in lax mode the reference consumes control chars (incl. the
    # newline) INSIDE the broken IRI with a warning (n3.c:646-655), so
    # the statement after the bad line is eaten by recovery — only the
    # first statement survives, but the run succeeds.
    p.write_text("<http://a/s> <http://a/p> <http://a/o> .\n"
                 "<bro ken\n"
                 "<http://a/s2> <http://a/p> <http://a/o> .\n")
    rc, out, err = run(str(p))
    assert rc == 1 and err
    rc2, out2, err2 = run("-l", str(p))
    assert rc2 == 0
    assert out2.count("\n") == 1 and err2  # warning still reported
    rc3, out3, err3 = run("-l", "-q", str(p))
    assert rc3 == 0 and err3 == ""        # -q silences the warning


def test_output_syntax_defaults():
    # turtle in -> ntriples out; trig in -> nquads out (graph kept)
    rc, out, _ = run("-i", "trig", "-s",
                     "<g:x> { <http://a/s> <http://a/p> <http://a/o> }")
    assert rc == 0
    assert out == "<http://a/s> <http://a/p> <http://a/o> <g:x> .\n"


def test_turtle_output_qualifies_and_f_keeps_full():
    # a FULL URI in the input gets qualified against the declared
    # prefix by default; -f keeps it full (CURIEs in the input stay
    # CURIEs either way, as in serd)
    doc = ("@prefix ex: <http://example.org/> .\n"
           "<http://example.org/s> ex:p ex:o .\n")
    rc, out, _ = run("-o", "turtle", "-s", doc)
    assert rc == 0 and "ex:s" in out
    rc2, out2, _ = run("-o", "turtle", "-f", "-s", doc)
    assert rc2 == 0 and "<http://example.org/s>" in out2


def test_ascii_flag_escapes_non_ascii():
    doc = '<http://a/s> <http://a/p> "café" .'
    rc, out, _ = run("-a", "-i", "ntriples", "-o", "nquads", "-s", doc)
    assert rc == 0 and "\\u00E9" in out
    rc2, out2, _ = run("-i", "ntriples", "-o", "nquads", "-s", doc)
    assert rc2 == 0 and "café" in out2


def test_add_and_chop_blank_prefix():
    doc = "_:b1 <http://a/p> _:b2 ."
    rc, out, _ = run("-i", "ntriples", "-p", "pre", "-s", doc)
    assert rc == 0 and "_:preb1" in out
    rc2, out2, _ = run("-i", "ntriples", "-p", "pre", "-c", "pre",
                       "-s", doc)
    assert rc2 == 0 and "_:b1" in out2 and "pre" not in out2

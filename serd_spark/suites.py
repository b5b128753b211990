"""W3C / serd-extra conformance suite harness (filesystem fixtures).

Mirrors the reference's manifest-driven golden testing
(/root/reference/test/run_suite.py, test/meson.build:155-195):
suite base namespaces are ``http://www.w3.org/2013/<Suite>Tests/`` and
``http://drobilla.net/sw/serd/test/<suite>/``; an eval test's base URI
is ``<ns><filename>``.  Test kind discovery is name/pair-based:
``*-bad-*`` → negative, input+golden pair → eval, else positive
syntax.  The suite corpora are read from the read-only reference
checkout (public W3C test data).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

REFERENCE_TEST_DIR = os.environ.get(
    "SERD_SPARK_SUITE_DIR", "/root/reference/test"
)

NS_W3 = "http://www.w3.org/2013/"
NS_SERDTEST = "http://drobilla.net/sw/serd/test/"

# suite name -> (subdir, base namespace, syntax, input ext(s), golden ext)
# syntax None = per-file by extension (.ttl/.trig/.nt/.nq)
SUITES = {
    "turtle": ("w3c/turtle", NS_W3 + "TurtleTests/", "turtle", ".ttl", ".nt"),
    "trig": ("w3c/trig", NS_W3 + "TriGTests/", "trig", ".trig", ".nq"),
    "ntriples": ("w3c/ntriples", NS_W3 + "NTriplesTests/", "ntriples",
                 ".nt", None),
    "nquads": ("w3c/nquads", NS_W3 + "NQuadsTests/", "nquads", ".nq", None),
    "good": ("extra/good", NS_SERDTEST + "good/", "turtle", ".ttl", ".nt"),
    "big": ("extra/big", NS_SERDTEST + "big/", "turtle", ".ttl", ".nt"),
    # serd extra negative suites (strict must reject every file)
    "bad": ("extra/bad", NS_SERDTEST + "bad/", None,
            (".ttl", ".trig", ".nt", ".nq"), None),
    "eof": ("extra/eof", NS_SERDTEST + "eof/", None,
            (".ttl", ".trig", ".nt", ".nq"), None),
    # lax suite is manifest-driven: strict must reject, lax output must
    # match the golden (run_suite.py --lax semantics) — see lax_entries()
    "lax": ("extra/lax", NS_SERDTEST + "lax/", None,
            (".ttl", ".trig", ".nt", ".nq"), None),
}

_EXT_SYNTAX = {".ttl": "turtle", ".trig": "trig",
               ".nt": "ntriples", ".nq": "nquads"}


@dataclass
class SuiteTest:
    suite: str
    name: str          # input filename
    kind: str          # eval | positive | negative
    syntax: str        # turtle | trig | ntriples | nquads
    base_uri: str
    path: str          # input file path
    golden_path: Optional[str]  # golden NT/NQ path (eval only)

    def read_input(self) -> bytes:
        # Raw bytes: the parsers own UTF-8 validation (strict rejects
        # invalid sequences, lax substitutes U+FFFD — read_utf8.c).
        with open(self.path, "rb") as f:
            return f.read()

    def read_text(self) -> str:
        """Decoded input for str-only consumers (Spark text columns)."""
        from .chars import lax_utf8_decode

        return lax_utf8_decode(self.read_input())

    def read_golden(self) -> str:
        assert self.golden_path is not None
        with open(self.golden_path, "rb") as f:
            return f.read().decode("utf-8", errors="replace")


def discover(suite: str) -> list[SuiteTest]:
    subdir, ns, syntax, in_exts, gold_ext = SUITES[suite]
    if isinstance(in_exts, str):
        in_exts = (in_exts,)
    root = os.path.join(REFERENCE_TEST_DIR, subdir)
    tests: list[SuiteTest] = []
    if not os.path.isdir(root):
        return tests
    names = sorted(os.listdir(root))
    present = set(names)
    for name in names:
        ext = next((e for e in in_exts if name.endswith(e)), None)
        if ext is None or name.startswith("manifest"):
            continue
        if suite == "lax" and "-out" in name:
            continue  # goldens, not inputs (paired via lax_entries)
        stem = name[: -len(ext)]
        negative = ("-bad-" in name or name.startswith("bad-")
                    or suite in ("bad", "eof", "lax"))
        golden = None
        kind = "positive"
        if negative:
            kind = "negative"
        elif gold_ext:
            cand = stem + gold_ext
            if cand != name and cand in present:
                golden = os.path.join(root, cand)
                kind = "eval"
        tests.append(
            SuiteTest(
                suite=suite,
                name=name,
                kind=kind,
                syntax=syntax or _EXT_SYNTAX[ext],
                base_uri=ns + name,
                path=os.path.join(root, name),
                golden_path=golden,
            )
        )
    return tests


def lax_entries() -> list[tuple[SuiteTest, str]]:
    """(test, golden_path) pairs for the lax suite, read from its own
    manifest.ttl *with our Turtle parser* (the reference loads suite
    manifests with serdi itself: run_suite.py + serd_test_util).
    Semantics (run_suite.py:96-110 with --lax): strict parse must
    reject; lax parse output must match the mf:result golden."""
    from .turtle import parse_turtle

    subdir, ns, _, _, _ = SUITES["lax"]
    root = os.path.join(REFERENCE_TEST_DIR, subdir)
    mpath = os.path.join(root, "manifest.ttl")
    if not os.path.isfile(mpath):
        return []
    with open(mpath, "rb") as f:
        mtriples, merrors = parse_turtle(f.read(), base_uri=ns)
    if merrors:
        raise RuntimeError(f"lax manifest failed to parse: {merrors[:2]}")
    NS_MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
    actions: dict[str, str] = {}
    results: dict[str, str] = {}
    for t in mtriples:
        if t.p == NS_MF + "action":
            actions[t.s] = t.o
        elif t.p == NS_MF + "result":
            results[t.s] = t.o
    out = []
    for s, action in sorted(actions.items()):
        name = action.rsplit("/", 1)[-1]
        golden = results[s].rsplit("/", 1)[-1]
        ext = "." + name.rsplit(".", 1)[-1]
        out.append((
            SuiteTest(suite="lax", name=name, kind="negative",
                      syntax=_EXT_SYNTAX[ext], base_uri=ns + name,
                      path=os.path.join(root, name),
                      golden_path=os.path.join(root, golden)),
            os.path.join(root, golden),
        ))
    return out


def run_test(t: SuiteTest, lax: bool = False):
    """Parse a suite input → (triples, errors)."""
    from .ntriples import parse_ntriples
    from .turtle import parse_turtle

    text = t.read_input()
    if t.syntax in ("ntriples", "nquads"):
        return parse_ntriples(text, nquads=(t.syntax == "nquads"), lax=lax)
    return parse_turtle(text, base_uri=t.base_uri,
                        trig=(t.syntax == "trig"), lax=lax)


def parse_golden(t: SuiteTest):
    from .ntriples import parse_ntriples

    triples, errors = parse_ntriples(t.read_golden(), nquads=True, lax=False)
    if errors:
        raise RuntimeError(f"golden file failed to parse: {t.golden_path}: "
                           f"{errors[:2]}")
    return triples


def score_suite(suite: str, lax: bool = False):
    """Run a whole suite → dict with pass/fail counts and P/R."""
    from .compare import isomorphic, match_counts

    results = {"suite": suite, "total": 0, "passed": 0,
               "failed": [], "matched": 0, "got": 0, "want": 0}
    for t in discover(suite):
        results["total"] += 1
        try:
            triples, errors = run_test(t, lax=lax)
        except Exception as e:  # parser crash = failure, not abort
            triples, errors = [], [(0, f"crash: {e!r}")]
        ok = False
        if t.kind == "negative":
            ok = bool(errors)
            if ok:
                results["passed"] += 1
            else:
                results["failed"].append((t.name, "accepted bad input"))
            continue
        if errors:
            results["failed"].append((t.name, f"errors: {errors[:2]}"))
            if t.kind == "eval":
                want = parse_golden(t)
                m, a, b = match_counts(triples, want)
                results["matched"] += m
                results["got"] += a
                results["want"] += b
            continue
        if t.kind == "positive":
            results["passed"] += 1
            continue
        want = parse_golden(t)
        m, a, b = match_counts(triples, want)
        results["matched"] += m
        results["got"] += a
        results["want"] += b
        if m == a == b:
            results["passed"] += 1
        else:
            results["failed"].append(
                (t.name, f"triples mismatch: matched {m}, got {a}, want {b}"))
    g = results["got"] or 1
    w = results["want"] or 1
    results["precision"] = results["matched"] / g
    results["recall"] = results["matched"] / w
    return results


def score_lax_suite():
    """Lax suite (manifest-paired): strict parse must reject each
    input; lax parse must emit exactly the golden triples (the
    run_suite.py --lax eval path)."""
    from .compare import match_counts

    results = {"suite": "lax", "total": 0, "passed": 0, "failed": [],
               "matched": 0, "got": 0, "want": 0}
    for t, golden_path in lax_entries():
        results["total"] += 1
        _, strict_errors = run_test(t, lax=False)
        if not strict_errors:
            results["failed"].append((t.name, "strict accepted bad input"))
            continue
        triples, _ = run_test(t, lax=True)
        want = parse_golden(t)
        m, a, b = match_counts(triples, want)
        results["matched"] += m
        results["got"] += a
        results["want"] += b
        if m == a == b:
            results["passed"] += 1
        else:
            results["failed"].append(
                (t.name, f"lax mismatch: matched {m}, got {a}, want {b}"))
    g = results["got"] or 1
    w = results["want"] or 1
    results["precision"] = results["matched"] / g
    results["recall"] = results["matched"] / w
    return results

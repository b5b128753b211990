"""Spark-stage tests: parse paths, chunked-vs-whole equivalence, the
W3C turtle suite executed *through* the Spark pipeline, and the
resumable end-to-end pipeline."""

import os

import pytest

from serd_spark.compare import match_counts
from serd_spark.nodes import Triple
from serd_spark.operators.parse import (
    parse_documents,
    parse_documents_chunked,
    parse_ntriples_lines,
    split_quarantine,
)
from serd_spark.transcripts import gen_local, transcripts_df

pytestmark = pytest.mark.spark


def collect_triples(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.conv_id, []).append(
            Triple(r.g, r.s, r.s_type, r.p, r.o, r.o_type,
                   r.o_datatype, r.o_lang))
    return out


@pytest.fixture(scope="module")
def small_corpus(spark):
    df = transcripts_df(spark, 20, mega_every=7, mega_factor=12)
    df.cache().count()
    return df


def test_parse_matches_driver_side(spark, small_corpus):
    """Spark grouped-map parse == driver-side parse of the same docs."""
    from serd_spark.operators.parse import DEFAULT_BASE_TEMPLATE
    from serd_spark.turtle import parse_turtle

    got = collect_triples(
        split_quarantine(parse_documents(small_corpus))[0])

    rows = gen_local(20, mega_every=7, mega_factor=12)
    docs = {}
    for conv_id, turn_idx, role, text, tool, ts in rows:
        docs.setdefault(conv_id, []).append((turn_idx, text))
    assert set(docs) == set(got)
    for conv_id, turns in docs.items():
        text = "\n".join(t for _, t in sorted(turns))
        want, errors = parse_turtle(
            text,
            base_uri=DEFAULT_BASE_TEMPLATE.format(conv_id=conv_id),
            blank_prefix=f"{conv_id}-", lax=True)
        assert not errors
        m, a, b = match_counts(got[conv_id], want)
        assert m == a == b, (conv_id, m, a, b)


def test_chunked_equals_whole(spark, small_corpus):
    whole = collect_triples(
        split_quarantine(parse_documents(small_corpus))[0])
    chunked = collect_triples(
        split_quarantine(
            parse_documents_chunked(small_corpus, chunk_turns=8))[0])
    assert set(whole) == set(chunked)
    for conv in whole:
        m, a, b = match_counts(whole[conv], chunked[conv])
        assert m == a == b, (conv, m, a, b)


def test_ntriples_line_path(spark):
    lines = [
        '<http://a/s> <http://a/p> "hi" .',
        "<http://a/s> <http://a/p> <http://a/o> <http://a/g> .",
        "bad line",
        "# comment",
    ]
    df = spark.createDataFrame(
        [("c1", 0, "user", "\n".join(lines), None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    tri, err = split_quarantine(parse_ntriples_lines(df))
    assert tri.count() == 2
    assert err.count() == 1
    plan = tri._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # shuffle-free path


def test_w3c_turtle_through_spark(spark):
    """All W3C Turtle eval tests as transcript rows through the Spark
    parse stage; P/R == 1.0 (the BASELINE gate, held exactly)."""
    from serd_spark.suites import discover, parse_golden

    tests = [t for t in discover("turtle") if t.kind == "eval"]
    assert len(tests) > 100
    rows = [(t.name, 0, "user", t.read_text(), None, None) for t in tests]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    parsed = parse_documents(
        df, syntax="turtle", lax=False,
        base_template="http://www.w3.org/2013/TurtleTests/{conv_id}")
    tri, err = split_quarantine(parsed)
    assert err.count() == 0
    got = collect_triples(tri)
    matched = n_got = n_want = 0
    for t in tests:
        want = parse_golden(t)
        m, a, b = match_counts(got.get(t.name, []), want)
        matched += m
        n_got += a
        n_want += b
        assert m == a == b, (t.name, m, a, b)
    assert matched == n_got == n_want


def test_pipeline_end_to_end_and_resume(spark, tmpdir_path):
    from serd_spark.pipeline import KGPipeline

    tdf = transcripts_df(spark, 12, mega_every=5, mega_factor=10)
    pipe = KGPipeline(spark, tmpdir_path, chunk_turns=8)
    s1 = pipe.run(tdf)
    assert s1["n_triples"] > 0
    assert s1["n_errors"] == 0
    assert os.path.exists(os.path.join(tmpdir_path, "summary.json"))
    # canonical sorted output exists and is sorted
    out = spark.read.parquet(s1["output"]).collect()
    lines = [r.line for r in out]
    assert len(lines) == s1["n_triples"]

    # resume: second run must skip all stages (checkpoint markers)
    pipe2 = KGPipeline(spark, tmpdir_path, chunk_turns=8)
    s2 = pipe2.run(tdf)
    assert s2["n_triples"] == s1["n_triples"]
    resumed = [st for st in s2["stages"] if st.get("resumed")]
    assert len(resumed) >= 4


def test_lax_quarantine_through_pipeline(spark, tmpdir_path):
    from serd_spark.pipeline import KGPipeline

    tdf = transcripts_df(spark, 15, mega_every=0, with_errors=True)
    pipe = KGPipeline(spark, tmpdir_path, chunk_turns=8)
    s = pipe.run(tdf)
    assert s["n_errors"] > 0       # injected errors quarantined
    assert s["n_triples"] > 0      # job still succeeds (lax, O-17)


def test_colocated_equals_chunked(spark):
    """The shuffle-free co-located path (bucketed-input layout) is
    row-identical to the distributed chunked path — same triples, same
    deterministic blank/stmt ids."""
    from serd_spark.operators.parse import (
        parse_documents_chunked,
        parse_documents_colocated,
    )
    from serd_spark.transcripts import transcripts_df

    tdf = transcripts_df(spark, 120, mega_every=16, mega_factor=20)
    a = parse_documents_chunked(tdf, chunk_turns=32)
    b = parse_documents_colocated(tdf, chunk_turns=32)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_locate_cursor_units():
    """(turn, line, col) mapping over a '\\n'-joined document
    (reference cursor: src/byte_source.h:14-18)."""
    from serd_spark.operators.parse import locate_cursor

    texts = [(0, "ab\ncd"), (3, "x"), (7, "line1\nline2")]
    turns = [(i, len(t)) for i, t in texts]
    text = "ab\ncd\nx\nline1\nline2"
    assert locate_cursor(0, text, turns) == (0, 1, 1)
    assert locate_cursor(1, text, turns) == (0, 1, 2)
    assert locate_cursor(3, text, turns) == (0, 2, 1)   # 'c'
    assert locate_cursor(4, text, turns) == (0, 2, 2)   # 'd'
    assert locate_cursor(6, text, turns) == (3, 1, 1)   # 'x' in turn 3
    assert locate_cursor(8, text, turns) == (7, 1, 1)   # 'l' of line1
    assert locate_cursor(14, text, turns) == (7, 2, 1)  # 'l' of line2
    assert locate_cursor(18, text, turns) == (7, 2, 5)


def test_error_cursor_reports_turn(spark):
    """A syntax error in turn k of a multi-turn conversation reports
    turn k and the in-turn line, not a flat char offset."""
    rows = [
        ("c1", 0, "user", "<http://a/s> <http://a/p> <http://a/o> .",
         None, None),
        ("c1", 2, "user", "# fine line\n<http://a/s <broken", None, None),
        ("c1", 5, "user", "<http://a/s2> <http://a/p> <http://a/o> .",
         None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    _, err = split_quarantine(parse_documents(df))
    msgs = [r.err for r in err.collect()]
    assert msgs, "expected a quarantined error"
    assert any(m.startswith("turn 2, line 2,") for m in msgs), msgs


def test_error_cursor_colocated_and_chunked(spark):
    rows = [
        ("c1", 0, "user", "<http://a/s> <http://a/p> <http://a/o> .",
         None, None),
        ("c1", 1, "user", "<http://a/s <broken", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    from serd_spark.operators.parse import (
        parse_documents_chunked,
        parse_documents_colocated,
    )
    for parsed in (parse_documents_chunked(df, chunk_turns=8),
                   parse_documents_colocated(df, chunk_turns=8,
                                             on_split="repartition")):
        _, err = split_quarantine(parsed)
        msgs = [r.err for r in err.collect()]
        assert any(m.startswith("turn 1, line 1,") for m in msgs), msgs


def test_colocated_guard_rejects_split_conversation(spark):
    """ADVICE r1: a conversation spanning partitions must fail loudly,
    not silently emit corrupt triples."""
    from serd_spark.operators.parse import parse_documents_colocated

    rows = [("c1", i, "user",
             f"<http://a/s{i}> <http://a/p> <http://a/o> .", None, None)
            for i in range(16)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp").repartition(4)  # round-robin split
    with pytest.raises(ValueError, match="spans"):
        parse_documents_colocated(df).count()
    # repartition mode makes the precondition true by construction
    out = parse_documents_colocated(df, on_split="repartition")
    assert out.where("err is null").count() == 16


def test_nt_fast_path_equals_slow(spark):
    """Vectorized escape-free fast path == per-line parser on a batch
    mixing fast lines, escaped lines, comments, and bad lines."""
    from serd_spark.ntriples import parse_nt_line

    lines = [
        '<http://a/s> <http://a/p> "plain" .',
        '<http://a/s> <http://a/p> "" .',                      # empty lit
        '<http://a/s> <http://a/p> "x"@en-GB .',
        '<http://a/s> <http://a/p> "n"^^<http://dt> .',
        "_:b1 <http://a/p> _:b2.x .",                          # dotted label
        "<http://a/s><http://a/p><http://a/o>.",               # no spaces
        '<http://a/s> <http://a/p> "esc\\t\\"q\\"" .',         # ECHAR
        '<http://a/s> <http://a/p> "\\u00e9\\U0001F600" .',    # UCHAR
        '<http://a/\\u00e9> <http://a/p> <http://a/o> .',      # IRI UCHAR
        "<http://a/s> <http://a/p> <http://a/o> <http://a/g> .",
        "<http://a/s> <http://a/p> <http://a/o> _:g .",
        "# comment",
        "<relative> <http://a/p> <http://a/o> .",              # bad: rel IRI
        "total junk",
    ]
    df = spark.createDataFrame(
        [("cX", 3, "user", "\n".join(lines), None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    got = {r.stmt_idx: r for r in parse_ntriples_lines(df).collect()}

    n_ok = n_err = 0
    for i, line in enumerate(lines):
        stmt_idx = (3 << 20) | i
        try:
            t = parse_nt_line(line, blank_prefix="cX-", nquads=True)
        except Exception as e:
            r = got[stmt_idx]
            assert r.err is not None
            assert r.err.startswith(f"turn 3, line {i + 1}:"), r.err
            assert str(e) in r.err
            n_err += 1
            continue
        if t is None:
            assert stmt_idx not in got
            continue
        r = got[stmt_idx]
        assert r.err is None, (line, r.err)
        assert (r.g, r.s, r.s_type, r.p, r.o, r.o_type, r.o_datatype,
                r.o_lang) == (t.g, t.s, t.s_type, t.p, t.o, t.o_type,
                              t.o_datatype, t.o_lang), line
        n_ok += 1
    assert n_ok == 11 and n_err == 2


def test_conv_metrics_single_pass_equivalence(spark):
    """conv_metrics_from_parsed(parsed) must equal
    conv_metrics(*split_quarantine(parsed)) — the single-aggregation
    form exists so the parse plan is evaluated once, not twice."""
    from serd_spark.operators.canonicalize import (
        conv_metrics,
        conv_metrics_from_parsed,
    )
    from serd_spark.operators.parse import (
        parse_documents_chunked,
        split_quarantine,
    )
    from serd_spark.transcripts import transcripts_df

    tdf = transcripts_df(spark, 24, mega_every=8, mega_factor=10)
    parsed = parse_documents_chunked(tdf, chunk_turns=16)
    a = {tuple(r) for r in
         conv_metrics(*split_quarantine(parsed)).collect()}
    b = {tuple(r) for r in conv_metrics_from_parsed(parsed).collect()}
    assert a == b and a


def test_syntax_dispatch_routes_nq_to_line_parser(spark):
    """parse_documents / parse_documents_chunked with an NT/NQ
    syntax route to the line parser (serd O-3 dispatch): a quad's
    graph label lands in ``g`` — the Turtle grammar has no
    production for it and would quarantine the line — and the
    default graph stays NULL."""
    from serd_spark.operators.parse import (
        parse_documents,
        parse_documents_chunked,
        split_quarantine,
    )

    tdf = spark.createDataFrame(
        [("c1", 0, "user",
          "<urn:s:1> <urn:p> <urn:o:1> <urn:g:x> .\n"
          "<urn:s:2> <urn:p> <urn:o:2> .", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string")
    for fn in (parse_documents, parse_documents_chunked):
        kw = ({"syntax": "nquads"} if fn is parse_documents
              else {"syntax": "nquads", "chunk_turns": 4})
        t, e = split_quarantine(fn(tdf, **kw))
        got = {(r.s, r.g) for r in t.collect()}
        assert got == {("urn:s:1", "urn:g:x"), ("urn:s:2", None)}
        assert e.count() == 0
    # ntriples dispatch REJECTS the graph label instead.
    t2, e2 = split_quarantine(
        parse_documents(tdf, syntax="ntriples"))
    assert e2.count() == 1
    assert {r.s for r in t2.collect()} == {"urn:s:2"}


def test_nt_strict_stops_at_first_error(spark):
    """Strict (lax=False) NT parse stops each conversation at its
    FIRST bad line — earlier triples stand, later triples and later
    errors drop; other conversations are untouched (serd strict
    aborts per document, O-17)."""
    from serd_spark.operators.parse import (
        parse_ntriples_lines,
        split_quarantine,
    )

    tdf = spark.createDataFrame(
        [("c1", 0, "user",
          "<urn:s:1> <urn:p> <urn:o:1> .\n"
          "junk line .\n"
          "<urn:s:2> <urn:p> <urn:o:2> .\n"
          "more junk .", None, None),
         ("c2", 0, "user", "<urn:s:3> <urn:p> <urn:o:3> .",
          None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string")
    t, e = split_quarantine(parse_ntriples_lines(tdf, lax=False))
    assert {r.s for r in t.collect()} == {"urn:s:1", "urn:s:3"}
    errs = e.collect()
    assert len(errs) == 1 and errs[0].conv_id == "c1"
    # lax keeps everything and quarantines BOTH bad lines
    t2, e2 = split_quarantine(parse_ntriples_lines(tdf, lax=True))
    assert {r.s for r in t2.collect()} == {
        "urn:s:1", "urn:s:2", "urn:s:3"}
    assert e2.count() == 2


def test_line_syntax_rejects_base_template(spark):
    """ADVICE r6: the NT/NQ dispatch used to silently drop a caller's
    base_template (the line grammars have no relative-IRI production);
    a non-default value is now rejected on both entry points."""
    tdf = spark.createDataFrame(
        [("c1", 0, "user", "<urn:a> <urn:b> <urn:c> .", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string")
    with pytest.raises(ValueError, match="base_template"):
        parse_documents(tdf, syntax="ntriples",
                        base_template="http://x/{conv_id}")
    with pytest.raises(ValueError, match="base_template"):
        parse_documents_chunked(tdf, syntax="nquads",
                                base_template="http://x/{conv_id}")
    # the default template stays accepted (and ignored, per NT spec)
    assert parse_documents(tdf, syntax="ntriples").count() == 1

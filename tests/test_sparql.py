"""SPARQL text front-end: the documented grammar subset translates
onto the composer correctly, and everything outside it raises
SparqlUnsupported naming the construct."""
import pytest

from tests.conftest import *  # noqa: F401,F403 (spark fixture)


def _t(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _q(spark, rows):
    return spark.createDataFrame(
        rows, "g string, s string, p string, o string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _t(spark, [
        ("a", "urn:p", "b"), ("b", "urn:p", "c"), ("c", "urn:p", "d"),
        ("a", "urn:r", "c"),
        ("a", "urn:name", "Anna"), ("b", "urn:name", "Ben"),
        ("b", "urn:age", "41"), ("c", "urn:age", "7"),
    ])


def _run(df, q):
    from serd_spark.sparql import sparql

    return sorted(tuple(r) for r in sparql(df, q).collect())


def test_basic_select_prefix_filter(spark, corpus):
    assert _run(corpus, "SELECT ?x ?y WHERE { ?x <urn:p> ?y }") == [
        ("a", "b"), ("b", "c"), ("c", "d")]
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x ?n WHERE { ?x u:name ?n . FILTER(?n != "Ben") }
    """) == [("a", "Anna")]
    # numeric literal comparison casts (not lexicographic: '7' > '41')
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x WHERE { ?x u:age ?a . FILTER(?a > 10) }
    """) == [("b",)]
    # REGEX → RLIKE, BOUND → IS NOT NULL
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x WHERE { ?x u:name ?n . FILTER(REGEX(?n, "^A")) }
    """) == [("a",)]


def test_optional_bind_exists(spark, corpus):
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x ?n WHERE {
            ?x u:p ?y OPTIONAL { ?x u:name ?n } FILTER(BOUND(?n)) }
    """) == [("a", "Anna"), ("b", "Ben")]
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x WHERE {
            ?x u:p ?y . FILTER NOT EXISTS { ?y u:name ?n2 } }
    """) == [("b",), ("c",)]
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x ?k WHERE {
            ?x u:name ?n . BIND(CONCAT(?x, "/", ?n) AS ?k) }
    """) == [("a", "a/Anna"), ("b", "b/Ben")]


def test_property_paths(spark, corpus):
    assert _run(corpus,
                "PREFIX u: <urn:> SELECT ?z WHERE { <a> u:p+ ?z }"
                ) == [("b",), ("c",), ("d",)]
    assert _run(corpus, """
        PREFIX u: <urn:> SELECT ?x ?z WHERE { ?x u:p/u:p ?z }
    """) == [("a", "c"), ("b", "d")]
    assert _run(corpus, """
        PREFIX u: <urn:> SELECT ?x ?z WHERE { ?x u:p{2,3} ?z }
    """) == [("a", "c"), ("a", "d"), ("b", "d")]
    got = _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x ?z WHERE { ?x (u:p|u:r) ?z . ?z u:name ?nm }
    """)
    assert got == [("a", "b")]
    # inverse
    assert _run(corpus,
                "PREFIX u: <urn:> SELECT ?x WHERE { <b> ^u:p ?x }"
                ) == [("a",)]


def test_const_subject_star_and_union(spark, corpus):
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?n ?ag WHERE { <b> u:name ?n ; u:age ?ag }
    """) == [("Ben", "41")]
    got = _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x ?y WHERE { { ?x u:r ?y } UNION { ?x u:name ?y } }
    """)
    assert got == [("a", "Anna"), ("a", "c"), ("b", "Ben")]


def test_aggregates_order_limit(spark, corpus):
    got = _run(corpus, """
        PREFIX u: <urn:>
        SELECT ?x (COUNT(*) AS ?n)
               (GROUP_CONCAT(?y; SEPARATOR=",") AS ?ys)
        WHERE { ?x u:p ?y } GROUP BY ?x
        HAVING(?n >= 1) ORDER BY ?x LIMIT 2
    """)
    assert got == [("a", 1, "b"), ("b", 1, "c")]
    # global aggregate, count distinct
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT (COUNT(DISTINCT ?x) AS ?dx) WHERE { ?x u:p ?y }
    """) == [(3,)]
    # numeric SUM skips non-numeric lexical forms via try_cast
    assert _run(corpus, """
        PREFIX u: <urn:>
        SELECT (SUM(?a) AS ?tot) WHERE { ?x u:age ?a }
    """) == [(48.0,)]


def test_graph_forms(spark):
    q = _q(spark, [("g1", "a", "urn:p", "b"),
                   ("g2", "a", "urn:p", "c")])
    assert _run(q, """
        SELECT ?x ?y WHERE { GRAPH <g2> { ?x <urn:p> ?y } }
    """) == [("a", "c")]
    assert _run(q, """
        SELECT ?x ?y WHERE { GRAPH ?g { ?x <urn:p> ?y } }
    """) == [("g1", "a", "b"), ("g2", "a", "c")]


def test_matches_direct_composer(spark, corpus):
    """The text form and the API form produce identical rows."""
    from serd_spark.operators.kg import bgp
    from serd_spark.sparql import sparql

    api = {tuple(r) for r in bgp(
        corpus,
        [("?o", "urn:p", "?c"), ("?c", "urn:name", "?n")],
        filters=["n <> 'Zed'"],
        not_exists=[[("?o", "urn:zz", "?x")]]).collect()}
    txt = {tuple(r) for r in sparql(corpus, """
        PREFIX u: <urn:>
        SELECT ?o ?c ?n WHERE {
          ?o u:p ?c . ?c u:name ?n .
          FILTER(?n != "Zed")
          FILTER NOT EXISTS { ?o u:zz ?x }
        }""").collect()}
    assert api == txt and txt


def test_unsupported_constructs_raise(spark, corpus):
    from serd_spark.sparql import SparqlUnsupported, sparql

    cases = [
        ("SELECT ?x WHERE { ?x <urn:p> ?y . MINUS { ?x <urn:r> ?z } }",
         "MINUS"),
        ("SELECT ?x WHERE { ?x (<urn:p>/<urn:r>){1,2} ?y }",
         "SEQUENCE"),
        ("BASE <urn:> SELECT ?x WHERE { ?x <urn:p> ?y }", "BASE"),
        ("SELECT ?x WHERE { ?x <urn:p> ?y } GROUP BY ?x",
         "GROUP BY without aggregates"),
        ("SELECT ?x WHERE { ?x q:name ?n }", "undeclared prefix"),
        ("SELECT ?x WHERE { GRAPH ?other { ?x <urn:p> ?y } }",
         "GRAPH variable must be ?g"),
        ("SELECT ?x WHERE { ?x <urn:p> ?y . VALUES ?x { <a> } }",
         "VALUES"),
    ]
    for query, frag in cases:
        with pytest.raises(SparqlUnsupported, match=frag.split()[0]):
            sparql(corpus, query)

"""RDF node type tags and the triple row schema.

Mirrors the reference's 5-valued node-type domain
(/root/reference/include/serd/serd.h:323-364): NOTHING/LITERAL/URI/
CURIE/BLANK.  CURIE is a syntactic type erased by expansion — our
parser expands CURIEs inline (it owns the Env fold), so emitted rows
only ever carry URI/BLANK/LITERAL.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

# Node type tags (stable byte values used in the triples DataFrame).
NOTHING = 0
LITERAL = 1
URI = 2
CURIE = 3  # transient, never emitted
BLANK = 4

TYPE_NAMES = {NOTHING: "nothing", LITERAL: "literal", URI: "uri",
              CURIE: "curie", BLANK: "blank"}

# Well-known namespaces (public RDF/XSD constants; cf.
# /root/reference/src/serd_internal.h:10-12).
NS_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
NS_XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = NS_RDF + "type"
RDF_FIRST = NS_RDF + "first"
RDF_REST = NS_RDF + "rest"
RDF_NIL = NS_RDF + "nil"

XSD_INTEGER = NS_XSD + "integer"
XSD_DECIMAL = NS_XSD + "decimal"
XSD_DOUBLE = NS_XSD + "double"
XSD_BOOLEAN = NS_XSD + "boolean"
XSD_BASE64 = NS_XSD + "base64Binary"


class Node(NamedTuple):
    """One RDF term: value + type tag + optional datatype/lang."""

    value: str
    type: int
    datatype: Optional[str] = None
    lang: Optional[str] = None


class Triple(NamedTuple):
    """One emitted statement (quad).  ``g`` is None in the default graph.

    Mirrors the statement-sink signature
    (/root/reference/include/serd/serd.h:576-584) flattened to a row.
    """

    g: Optional[str]
    s: str
    s_type: int
    p: str
    o: str
    o_type: int
    o_datatype: Optional[str] = None
    o_lang: Optional[str] = None


# Spark-side schema string for a triples DataFrame (adds lineage cols).
TRIPLES_SCHEMA = (
    "conv_id string, stmt_idx long, g string, s string, s_type int, "
    "p string, o string, o_type int, o_datatype string, o_lang string"
)

# Error-ledger schema for lax-mode quarantine (O-17).
ERRORS_SCHEMA = "conv_id string, err_idx long, message string, fragment string"

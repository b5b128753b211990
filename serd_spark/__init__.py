"""serd_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of the streaming RDF library serd
(reference: /root/reference, studied for behavior only) as a
Spark-first pipeline: Turtle/TriG/NTriples/NQuads parsing, CURIE
expansion, RFC-3986 relative-URI resolution, deterministic blank-node
relabeling, and canonical sorted NQuads-equivalent materialization —
all over a DataFrame of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts).

Layout:
  nodes        node type tags + triple schema
  chars        Turtle/NTriples character classes (clean-room from the
               W3C Turtle grammar)
  uri          RFC 3986 parser/resolver (vectorizable pure functions)
  escapes      UCHAR/ECHAR unescaping + canonical writer escaping
  env          per-document lexical environment (prefixes + base chain)
  turtle       recursive-descent Turtle/TriG parser (per-document)
  ntriples     line-based NTriples/NQuads parser
  writer       canonical NQuads/NTriples line formatter + Turtle
               abbreviation writer
  operators/   Spark DataFrame stages (parse, expand, canonicalize,
               materialize, dedup, similarity, text, multimodal)
  pipeline     end-to-end KG job with checkpoints/lineage/metrics
  transcripts  deterministic synthetic transcript corpus generator
  streaming/   Structured Streaming incremental ingest
"""

__version__ = "0.1.0"

"""Byte-exact serdi-style Turtle/TriG writer (O-24..O-29 parity).

Re-expresses the reference writer's streaming abbreviation state
machine (/root/reference/src/writer.c:36-103 separator rules,
640-720 write_sep, 1036-1240 statement/end-anon/finish) plus the
reader-side statement *flags* protocol that drives it
(/root/reference/include/serd/serd.h SerdStatementFlags;
src/n3.c read_anon 917-973, read_collection 1165-1227;
src/reader.c emit_statement 162-187 keeps only continuation flags).

Two pieces:

- :class:`EventParser` — a TurtleParser subclass that additionally
  produces serd's sink-event stream in serd's emission order:
  ``("prefix", name, raw, resolved)``, ``("base", raw, resolved)``,
  ``("stmt", flags, g_ev, s_ev, p_ev, o_ev)``, ``("end", blank_id)``.
  Term events carry the *syntactic* form (CURIE spelling preserved,
  IRIREF resolved) exactly as serd's reader hands nodes to the writer.
- :class:`SerdiWriter` — the writer state machine (context stack,
  separator table, indent, comma-indent, last-sep memory) producing
  output byte-identical to ``serdi -i turtle -o turtle`` (the
  "pretty" test suite: every file reproduces itself byte-for-byte).

Style fixed at serdi's Turtle default: ABBREVIATED|CURIED|RESOLVED
(src/serdi.c:142-175 choose_style).
"""

from __future__ import annotations

import re
from typing import Optional

from .chars import is_digit, is_pn_chars, is_pn_chars_u

_RE_PN_ESC = re.compile(r"\\(.)")
from .nodes import (
    BLANK,
    LITERAL,
    NS_XSD,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    URI,
    Node,
)
from .turtle import _EOF, TurtleParser
from .uri import URIParts, uri_parse, uri_resolve

# ---- statement flags (serd.h SerdStatementFlags) ----

EMPTY_S = 1 << 1
EMPTY_O = 1 << 2
ANON_S_BEGIN = 1 << 3
ANON_O_BEGIN = 1 << 4
ANON_CONT = 1 << 5
LIST_S_BEGIN = 1 << 6
LIST_O_BEGIN = 1 << 7
LIST_CONT = 1 << 8

_CONT = ANON_CONT | LIST_CONT

# ---- literal node flags (serd.h SerdNodeFlags) ----

HAS_NEWLINE = 1
HAS_QUOTE = 2


def _string_flags(body: str) -> int:
    """Serd's reader-side literal flags: raw newline/quote characters
    and the \\n/\\r ECHARs set flags; other escapes do not
    (n3.c:133-180 read_ECHAR/read_character)."""
    fl = 0
    k, n = 0, len(body)
    while k < n:
        c = body[k]
        if c == "\\":
            if k + 1 < n and body[k + 1] in "nr":
                fl |= HAS_NEWLINE
            k += 2
            continue
        if c in "\n\r":
            fl |= HAS_NEWLINE
        elif c in "\"'":
            fl |= HAS_QUOTE
        k += 1
    return fl


class EventParser(TurtleParser):
    """TurtleParser that also emits serd's statement-event stream in
    serd's exact emission order (parent statement before anonymous /
    list body, flags per n3.c, one-shot flags cleared after each emit
    as in reader.c:186)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.events: list[tuple] = []
        self.flags = 0
        self._term: Optional[tuple] = None
        self._lit_flags = 0
        self._graph_ev: Optional[tuple] = None

    # ---- term wrappers: record syntactic event forms ----

    @staticmethod
    def _ev_matches(t: tuple, node: Node) -> bool:
        k = t[0]
        if k == "blank":
            return node.type == BLANK and t[1] == node.value
        if k == "uri":
            return node.type == URI and t[1] == node.value
        if k == "literal":
            return node.type == LITERAL and t[1] == node.value
        if k == "curie":
            return node.type == URI
        return False

    def _take_term(self, node: Node) -> tuple:
        t, self._term = self._term, None
        if t is not None and self._ev_matches(t, node):
            return t
        if node.type == BLANK:
            return ("blank", node.value)
        if node.type == LITERAL:
            return ("literal", node.value,
                    ("uri", node.datatype) if node.datatype else None,
                    node.lang, 0)
        return ("uri", node.value)

    def read_iriref(self) -> str:
        v = super().read_iriref()
        self._term = ("uri", v)
        return v

    def read_blank_label(self) -> Node:
        n = super().read_blank_label()
        self._term = ("blank", n.value)
        return n

    def read_prefixed_name_node(self):
        start = self.i
        node, ate_dot = super().read_prefixed_name_node()
        raw = self.s[start : self.i]
        if ate_dot and raw.endswith("."):
            raw = raw[:-1]
        if node.type == LITERAL:  # bareword true/false
            self._term = ("literal", node.value,
                          ("uri", node.datatype), None, 0)
        else:
            # Store the UNESCAPED name: serd's reader unescapes
            # PN_LOCAL \-escapes into the node; the writer re-escapes
            # on output (write_lname, writer.c:449-486).
            self._term = ("curie", _RE_PN_ESC.sub(r"\1", raw))
        return node, ate_dot

    def read_verb(self) -> Node:
        start = self.i
        node = super().read_verb()
        if (self.i == start + 1 and self.s[start] == "a"
                and node.value == RDF_TYPE):
            self._term = ("uri", RDF_TYPE)
        return node

    def read_string_body(self, q: str) -> str:
        start = self.i
        v = super().read_string_body(q)
        raw = self.s[start : self.i]
        body = raw[3:-3] if raw.startswith(q * 3) else raw[1:-1]
        self._lit_flags = _string_flags(body)
        return v

    def read_quoted_literal(self) -> Node:
        self._term = None
        node = super().read_quoted_literal()
        dt_ev = self._term if node.datatype else None
        self._term = ("literal", node.value, dt_ev, node.lang,
                      self._lit_flags)
        return node

    def read_number(self) -> Node:
        node = super().read_number()
        self._term = ("literal", node.value, ("uri", node.datatype),
                      None, 0)
        return node

    # ---- directives ----

    def read_prefix_body(self, sparql: bool) -> None:
        super().read_prefix_body(sparql)
        _, name, raw = self.directives[-1]
        self.events.append(("prefix", name, raw, self.env.prefixes[name]))

    def read_base_body(self, sparql: bool) -> None:
        super().read_base_body(sparql)
        self.events.append(("base", self.directives[-1][2],
                            self.env.base_uri))

    # ---- emission (serd order: parent before body) ----

    def emit_ev(self, subj, s_ev, verb, v_ev, obj, o_ev) -> None:
        self.emit(subj, verb, obj)
        self.events.append(
            ("stmt", self.flags, self._graph_ev, s_ev, v_ev, o_ev))
        self.flags &= _CONT  # reader.c:186 — keep only continuations

    def read_statement(self) -> None:
        self.flags = 0  # statement-local flags (read_n3_statement)
        self._term = None
        super().read_statement()

    def read_triples(self) -> None:
        c = self.peek()
        if c == "[":
            mark = self.i
            self.expect("[")
            self.skip_ws()
            if self.peek() == "]":
                self.i += 1
                subj = self.gen_blank()
                self.flags |= EMPTY_S
                self.read_predicate_object_list(subj)
                return
            self.i = mark
            subj = self.read_anon(subject=True)
            self.skip_ws()
            if self.peek() not in (".", "}", _EOF):
                self.read_predicate_object_list(subj)
            return
        super().read_triples()

    def read_predicate_object_list(self, subj: Node) -> None:
        s_ev = self._take_term(subj)
        while True:
            self.skip_ws()
            verb = self.read_verb()
            v_ev = self._take_term(verb)
            self.skip_ws()
            self._object_list(subj, s_ev, verb, v_ev)
            self.skip_ws()
            if self.peek() == ";":
                while True:
                    self.i += 1
                    self.skip_ws()
                    if self.peek() != ";":
                        break
                if self.peek() in (".", "}", "]", _EOF):
                    return
                continue
            return

    def read_object_list(self, subj: Node, verb: Node) -> None:
        # only reached through our read_predicate_object_list
        self._object_list(subj, self._take_term(subj), verb,
                          self._take_term(verb))

    def _object_list(self, subj, s_ev, verb, v_ev) -> None:
        while True:
            self.skip_ws()
            self._object(subj, s_ev, verb, v_ev)
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
                continue
            return

    def _object(self, subj, s_ev, verb, v_ev) -> Node:
        c = self.peek()
        if c == _EOF:
            raise self.err("unexpected end of input")
        if c == "[":
            return self.read_anon(False, subj, s_ev, verb, v_ev)
        if c == "(":
            return self.read_collection(subj, s_ev, verb, v_ev)
        obj = self._read_atomic_object()
        self.emit_ev(subj, s_ev, verb, v_ev, obj, self._take_term(obj))
        return obj

    def _read_atomic_object(self) -> Node:
        c = self.peek()
        if c == "<":
            return Node(self.read_iriref(), URI)
        if c == "_":
            return self.read_blank_label()
        if c in "\"'":
            return self.read_quoted_literal()
        if c in "+-." or is_digit(c):
            return self.read_number()
        node, ate_dot = self.read_prefixed_name_node()
        if ate_dot:
            self.i -= 1
        return node

    def read_anon(self, subject: bool, subj=None, s_ev=None,
                  verb=None, v_ev=None) -> Node:
        self.expect("[")
        self.skip_ws()
        self._term = None  # never inherit a stale term event
        node: Optional[Node] = None
        if not subject and self.peek() == "=":
            self.expect("=")
            self.expect("=")
            self.skip_ws()
            c = self.peek()
            if c == "<":
                node = Node(self.read_iriref(), URI)
            elif c == "_":
                node = self.read_blank_label()
            else:
                node, _ = self.read_prefixed_name_node()
            self.skip_ws()
            self.expect(";")
            self.skip_ws()
        empty = self.peek() == "]"
        old_flags = self.flags
        if subject:
            self.flags |= EMPTY_S if empty else ANON_S_BEGIN
        else:
            self.flags |= EMPTY_O if empty else ANON_O_BEGIN
        if node is None:
            node = self.gen_blank()
        n_ev = self._take_term(node) if self._term else (
            ("blank", node.value) if node.type == BLANK
            else ("uri", node.value))
        if subj is not None:
            self.emit_ev(subj, s_ev, verb, v_ev, node, n_ev)
        if empty:
            self.i += 1
            self._term = n_ev
            return node
        self.flags &= ~LIST_CONT
        if not subject:
            self.flags |= ANON_CONT
        self._term = n_ev
        self.read_predicate_object_list(node)
        self.skip_ws()
        self.events.append(("end", node.value))
        self.flags = old_flags
        self.expect("]")
        self._term = n_ev
        return node

    def read_collection(self, subj=None, s_ev=None,
                        verb=None, v_ev=None) -> Node:
        self.expect("(")
        self.skip_ws()
        end = self.peek() == ")"
        if end:
            head = Node(RDF_NIL, URI)
            h_ev = ("uri", RDF_NIL)
        else:
            head = self.gen_blank()
            h_ev = ("blank", head.value)
        if subj is not None:
            if not end:
                self.flags |= LIST_O_BEGIN
            self.emit_ev(subj, s_ev, verb, v_ev, head, h_ev)
            self.flags &= LIST_O_BEGIN  # n3.c:1186
            self.flags |= LIST_CONT
        elif not end:
            self.flags |= LIST_S_BEGIN
        if end:
            self.i += 1
            self.flags &= ~LIST_CONT
            self._term = h_ev
            return head
        node, n_ev = head, h_ev
        rdf_first = Node(RDF_FIRST, URI)
        f_ev = ("uri", RDF_FIRST)
        rdf_rest = Node(RDF_REST, URI)
        r_ev = ("uri", RDF_REST)
        nil = Node(RDF_NIL, URI)
        nil_ev = ("uri", RDF_NIL)
        while True:
            self._object(node, n_ev, rdf_first, f_ev)
            self.skip_ws()
            if self.peek() == ")":
                self.i += 1
                self.flags |= LIST_CONT
                self.emit_ev(node, n_ev, rdf_rest, r_ev, nil, nil_ev)
                self.flags &= ~LIST_CONT
                self._term = h_ev
                return head
            nxt = self.gen_blank()
            x_ev = ("blank", nxt.value)
            self.flags |= LIST_CONT
            self.emit_ev(node, n_ev, rdf_rest, r_ev, nxt, x_ev)
            node, n_ev = nxt, x_ev

    def read_wrapped_graph(self, label: Optional[Node]) -> None:
        g_ev = self._take_term(label) if label is not None else None
        old = self._graph_ev
        self._graph_ev = g_ev
        try:
            super().read_wrapped_graph(label)
        finally:
            self._graph_ev = old


# ---- writer state machine ----

# Sep ids (writer.c:53-70)
(S_NONE, S_STOP, S_END_P, S_END_O_N, S_END_O_NA, S_END_O_AA, S_S_P,
 S_P_O, S_GRAPH_L, S_GRAPH_R, S_ANON_L, S_ANON_R, S_LIST_L,
 S_LIST_SEP, S_LIST_R) = range(15)

PRE_SPACE, PRE_LINE, POST_SPACE, POST_LINE = 1, 2, 4, 8

# (char, indent_delta, flags) — writer.c:87-103
_RULES = [
    ("", 0, 0),                                # NONE
    (".", 0, PRE_SPACE),                       # STOP
    (";", 0, PRE_SPACE | POST_LINE),           # END_P
    (",", 0, PRE_SPACE | POST_LINE),           # END_O_N
    (",", 0, PRE_SPACE | POST_LINE),           # END_O_NA
    (",", 0, PRE_SPACE | POST_SPACE),          # END_O_AA
    ("", 1, POST_LINE),                        # S_P
    (" ", 0, 0),                               # P_O
    ("{", 1, PRE_SPACE | POST_LINE),           # GRAPH_L
    ("}", -1, POST_LINE),                      # GRAPH_R
    ("[", 1, 0),                               # ANON_L
    ("]", -1, PRE_LINE),                       # ANON_R
    ("(", 1, POST_LINE),                       # LIST_L
    ("", 0, PRE_LINE),                         # LIST_SEP
    (")", -1, PRE_LINE),                       # LIST_R
]

_IRI_MUST_ESCAPE = set('<>"{}|^`\\') | {chr(c) for c in range(0x21)}
_PN_LOCAL_ESC = set("_~.-!$&'()*+,;=/?#@%")

CTX_NAMED, CTX_BLANK, CTX_LIST = 0, 1, 2


def _uchar_escape(ch: str) -> str:
    c = ord(ch)
    return f"\\u{c:04X}" if c <= 0xFFFF else f"\\U{c:08X}"


def _path_of(p: URIParts) -> str:
    return p.path or ""


def _rooted_index(uri: URIParts, root: URIParts):
    """uri_utils.h:46-84 uri_rooted_index → (shared, root_idx) or
    None when schemes/authorities differ."""
    if not root or not root.scheme or root.scheme != uri.scheme \
            or (root.authority or "") != (uri.authority or ""):
        return None
    up, rp = _path_of(uri), _path_of(root)
    shared = root_idx = None
    n = min(len(up), len(rp))
    for i in range(n):
        if up[i] == rp[i]:
            if up[i] == "/":
                shared = root_idx = i
        else:
            # mismatch: root index advances to root's next '/', if any
            j = rp.find("/", i)
            if j >= 0:
                root_idx = j
            break
    return (shared, root_idx)


def _is_under(uri: URIParts, root: URIParts) -> bool:
    """uri_utils.h:93-97 uri_is_under."""
    r = _rooted_index(uri, root)
    if r is None:
        return False
    shared, root_idx = r
    return shared is not None and shared != 0 and shared == root_idx


def _is_related(uri: URIParts, root: URIParts) -> bool:
    """uri_utils.h:87-90 uri_is_related — shares any path prefix."""
    r = _rooted_index(uri, root)
    return r is not None and r[0] is not None


def _rel_path(uri_path: str, base_path: str) -> str:
    """uri.c:374-413 write_rel_path."""
    min_len = min(len(uri_path), len(base_path))
    last_shared = 0
    i = 0
    while i < min_len and uri_path[i] == base_path[i]:
        if uri_path[i] == "/":
            last_shared = i
        i += 1
    if i == len(uri_path) and i == len(base_path):
        return ""
    up = base_path.count("/", last_shared + 1)
    return "../" * up + uri_path[last_shared + 1 :]


def _serialise_relative(uri: URIParts, base: URIParts,
                        root: Optional[URIParts]) -> str:
    """uri.c:424-480 serd_uri_serialise_relative."""
    out: list[str] = []
    relative = (_is_under(uri, root) if root is not None
                else _is_related(uri, base))
    wrote_rel = False
    if relative:
        rel = _rel_path(_path_of(uri), _path_of(base))
        out.append(rel)
        wrote_rel = bool(rel)
    if not relative or (not wrote_rel and base and base.query is not None):
        if uri.scheme:
            out.append(uri.scheme + ":")
        if uri.authority is not None:
            out.append("//" + uri.authority)
            p = _path_of(uri)
            if (not uri.authority.endswith("/")
                    and p and not p.startswith("/")):
                out.append("/")
        out.append(_path_of(uri))
    if uri.query is not None:
        out.append("?" + uri.query)
    if uri.fragment is not None:
        out.append("#" + uri.fragment)
    return "".join(out)


class SerdiWriter:
    """Streaming Turtle/TriG writer, byte-parity with serdi defaults
    (style ABBREVIATED|CURIED|RESOLVED; writer.c state machine)."""

    def __init__(self, syntax: str = "turtle", base_uri: str = "",
                 root_uri: str = "", chop_blank_prefix: str = "",
                 qualify: bool = True, ascii_: bool = False):
        self.syntax = syntax
        self.out: list[str] = []
        self.prefixes: dict[str, str] = {}
        self.base = base_uri
        self._base_parts = uri_parse(base_uri) if base_uri else None
        # serdi -r: constrain relative serialization to a root
        # (writer.c:1324-1342 set_root_uri + write_IRIREF rooted check)
        self._root_parts = uri_parse(root_uri) if root_uri else None
        # serdi -c: chop a prefix from written blank labels
        # (writer.c:1279-1295 + write_blank 942-951)
        self.chop = chop_blank_prefix
        # serdi -f drops SERD_STYLE_CURIED: IRIs are never shortened
        # to CURIEs (choose_style, serdi.c:153-156); resolution stays
        self.qualify_style = qualify
        # serdi -a: escape all non-ASCII as \u/\U
        # (SERD_STYLE_ASCII; write_text_character writer.c:287-300)
        self.ascii = ascii_
        self.indent = 0
        self.last_sep = S_NONE
        self.stack: list[tuple] = []
        # context: [type, graph_ev, subject_ev, predicate_ev, comma_ind]
        self.ctx = [CTX_NAMED, None, None, None, False]

    # ---- low-level ----

    def _sink(self, s: str) -> None:
        self.out.append(s)

    def _newline(self) -> None:
        self._sink("\n" + "\t" * self.indent)

    def _space(self, flags: int) -> None:
        if flags & PRE_LINE:
            self._newline()
        elif flags & PRE_SPACE:
            self._sink(" ")

    def _sep(self, sep: int) -> None:
        ch, delta, flags = _RULES[sep]
        if delta and (flags & (PRE_LINE | POST_LINE)):
            self.indent += delta
        if sep == S_END_O_N and not self.ctx[4]:
            self.indent += 1
            self.ctx[4] = True
        elif sep == S_END_P and self.ctx[4]:
            self.indent -= 1
            self.ctx[4] = False
        self._space(flags)
        if ch:
            self._sink(ch)
        self._space(flags >> 2)
        if sep == S_STOP:
            self.indent = 1 if self.ctx[1] is not None else 0
            self.ctx[4] = False
            self._sink("\n")
        self.last_sep = sep

    def _push_ctx(self, typ: int, graph, subject, predicate) -> None:
        self.stack.append(self.ctx)
        self.ctx = [typ, graph, subject, predicate, False]

    def _pop_ctx(self) -> None:
        self.ctx = self.stack.pop()

    def _reset_ctx(self, graph: bool = False, indent: bool = False) -> None:
        while self.stack:
            self._pop_ctx()
        if graph:
            self.ctx[1] = None
        if indent:
            self.indent = 0
        self.ctx[0] = CTX_NAMED
        self.ctx[2] = None
        self.ctx[3] = None
        self.ctx[4] = False

    def _terminate(self) -> None:
        if self.ctx[2] is not None:
            self._sep(S_STOP)
        if self.ctx[1] is not None:
            self._sep(S_GRAPH_R)

    # ---- term formatting ----

    def _write_uri_text(self, s: str) -> None:
        buf: list[str] = []
        for ch in s:
            if ch in _IRI_MUST_ESCAPE or ch == "\x7f" or (
                    "\ud800" <= ch <= "\udfff") or (
                    self.ascii and ord(ch) > 0x7E):
                buf.append(_uchar_escape(ch))
            else:
                buf.append(ch)
        self._sink("".join(buf))

    def _write_lname(self, s: str) -> None:
        """writer.c:449-486 write_lname — escape non-PN chars."""
        buf: list[str] = []
        for k, ch in enumerate(s):
            if k == 0:
                ok = is_pn_chars_u(ch) or ch == ":" or ch.isdigit()
            else:
                ok = (is_pn_chars(ch) or ch == ":"
                      or (ch == "." and k + 1 < len(s)))
            if ok:
                buf.append(ch)
            elif ch in _PN_LOCAL_ESC:
                buf.append("\\" + ch)
            else:
                for b in ch.encode("utf-8"):
                    buf.append(f"%{b:02X}")
        self._sink("".join(buf))

    def _qualify(self, uri: str) -> Optional[tuple[str, str]]:
        """env.c:182-210 serd_env_qualify — first matching prefix."""
        for name, ns in self.prefixes.items():
            if ns and uri.startswith(ns):
                return name, uri[len(ns):]
        return None

    def _write_iriref(self, value: str) -> None:
        """writer.c:772-806 write_IRIREF with RESOLVED style."""
        self._sink("<")
        if self._base_parts is None:
            self._write_uri_text(value)
            self._sink(">")
            return
        parts = uri_parse(value)
        absolute = (value if parts.scheme
                    else uri_resolve(value, self.base))
        abs_parts = uri_parse(absolute)
        rooted = (self._root_parts is not None
                  and _is_under(self._base_parts, self._root_parts))
        root = self._root_parts if rooted else self._base_parts
        if (not _is_under(abs_parts, root)
                or self.syntax not in ("turtle", "trig")):
            self._write_uri_text(absolute)
        else:
            self._write_uri_text(
                _serialise_relative(parts, self._base_parts, root))
        self._sink(">")

    def _write_uri_node(self, value: str) -> None:
        if value == RDF_NIL:
            self._sink("()")
            return
        parts = uri_parse(value)
        if parts.scheme and self.qualify_style:
            q = self._qualify(value)
            if q is not None:
                self._write_lname(q[0])
                self._sink(":")
                self._write_lname(q[1])
                return
        self._write_iriref(value)

    def _xsd_name(self, dt_ev: Optional[tuple]) -> str:
        if dt_ev is None:
            return ""
        kind, text = dt_ev[0], dt_ev[1]
        if kind == "uri" and text.startswith(NS_XSD):
            return text[len(NS_XSD):]
        if kind == "curie":
            i = text.find(":")
            ns = self.prefixes.get(text[:i], "")
            if ns == NS_XSD:
                return text[i + 1:]
        return ""

    def _write_short_text(self, s: str) -> None:
        buf: list[str] = []
        for ch in s:
            if ch == "\\":
                buf.append("\\\\")
            elif ch == "\n":
                buf.append("\\n")
            elif ch == "\r":
                buf.append("\\r")
            elif ch == "\t":
                buf.append("\\t")
            elif ch == '"':
                buf.append('\\"')
            elif ch == "\b" and self.syntax == "turtle":
                buf.append("\\b")
            elif ch == "\f" and self.syntax == "turtle":
                buf.append("\\f")
            elif ord(ch) < 0x20 or ord(ch) == 0x7F or (
                    self.ascii and ord(ch) > 0x7E):
                buf.append(_uchar_escape(ch))
            else:
                buf.append(ch)
        self._sink("".join(buf))

    def _write_long_text(self, s: str) -> None:
        buf: list[str] = []
        n_quotes = 0
        n = len(s)
        for k, ch in enumerate(s):
            if ch != '"':
                n_quotes = 0
            if ch == '"':
                n_quotes += 1
                if n_quotes < 3 and k + 1 != n:
                    buf.append('"')
                else:
                    buf.append('\\"')
            elif ch == "\\":
                buf.append("\\\\")
            elif ch == "\b":
                buf.append("\\b")
            elif ch in "\n\r\t\f":
                buf.append(ch)
            elif ord(ch) < 0x20 or ord(ch) == 0x7F or (
                    self.ascii and ord(ch) > 0x7E):
                buf.append(_uchar_escape(ch))
            else:
                buf.append(ch)
        self._sink("".join(buf))

    def _write_literal(self, ev: tuple) -> None:
        _, value, dt_ev, lang, nflags = ev
        xsd = self._xsd_name(dt_ev)
        if xsd in ("boolean", "integer") or (
                xsd == "decimal" and "." in value
                and not value.endswith(".")):
            self._sink(value)
            return
        if nflags & (HAS_NEWLINE | HAS_QUOTE):
            self._sink('"""')
            self._write_long_text(value)
            self._sink('"""')
        else:
            self._sink('"')
            self._write_short_text(value)
            self._sink('"')
        if lang:
            self._sink("@" + lang)
        elif dt_ev is not None:
            self._sink("^^")
            self._write_iri(dt_ev)

    def _write_iri(self, ev: tuple) -> None:
        if ev[0] == "uri":
            self._write_uri_node(ev[1])
        else:  # curie passes through (write_curie → write_lname)
            self._write_lname(ev[1])

    def _write_node(self, ev: tuple, field: str, flags: int) -> None:
        kind = ev[0]
        if kind == "literal":
            self._write_literal(ev)
        elif kind == "uri":
            self._write_uri_node(ev[1])
        elif kind == "curie":
            self._write_lname(ev[1])
        elif kind == "blank":
            if field == "subject" and (flags & ANON_S_BEGIN) or \
                    field == "object" and (flags & ANON_O_BEGIN):
                self._sep(S_ANON_L)
            elif field == "subject" and (flags & LIST_S_BEGIN) or \
                    field == "object" and (flags & LIST_O_BEGIN):
                self._sep(S_LIST_L)
            elif field == "subject" and (flags & EMPTY_S) or \
                    field == "object" and (flags & EMPTY_O):
                self._sink("[]")
            else:
                label = ev[1]
                if self.chop and label.startswith(self.chop):
                    label = label[len(self.chop):]
                self._sink("_:" + label)

    def _write_pred(self, ev: tuple) -> None:
        if ev[0] == "uri" and ev[1] == RDF_TYPE:
            self._sink("a")
        else:
            self._write_iri(ev)
        self._sep(S_P_O)
        self.ctx[3] = ev
        self.ctx[4] = False

    # ---- sink API (serdi's four sinks) ----

    def set_prefix(self, name: str, raw_uri: str,
                   resolved: Optional[str] = None) -> None:
        if resolved is None:
            resolved = (raw_uri if uri_parse(raw_uri).scheme or not self.base
                        else uri_resolve(raw_uri, self.base))
        self.prefixes[name] = resolved
        had_subject = self.ctx[2] is not None
        self._terminate()
        if had_subject:
            self._sink("\n")
        self._sink("@prefix " + name + ": <")
        self._write_uri_text(raw_uri)
        self._sink(">")
        self._sep(S_STOP)
        self._reset_ctx(graph=True, indent=True)

    def set_base(self, raw_uri: str, resolved: Optional[str] = None) -> None:
        if resolved is None:
            resolved = (raw_uri if uri_parse(raw_uri).scheme or not self.base
                        else uri_resolve(raw_uri, self.base))
        self.base = resolved
        self._base_parts = uri_parse(resolved)
        had_subject = self.ctx[2] is not None
        self._terminate()
        if had_subject:
            self._sink("\n")
        self._sink("@base <" + raw_uri + ">")
        self._sep(S_STOP)
        self._reset_ctx(graph=True, indent=True)

    def write_statement(self, flags: int, g_ev, s_ev, p_ev, o_ev) -> None:
        """writer.c:1036-1193 serd_writer_write_statement."""
        if (flags & LIST_O_BEGIN) and o_ev[0] == "uri" \
                and o_ev[1] == RDF_NIL:
            flags &= ~LIST_O_BEGIN
        out_graph = g_ev if self.syntax == "trig" else None
        if (out_graph is not None and out_graph != self.ctx[1]) or (
                out_graph is None and self.ctx[1] is not None):
            self._terminate()
            self._reset_ctx(graph=True, indent=True)
            self._newline()
            if out_graph is not None:
                self._write_node(out_graph, "graph", flags)
                self._sep(S_GRAPH_L)
                self.ctx[1] = out_graph

        if flags & LIST_CONT:
            # writer.c:1151-1168
            if p_ev[1] == RDF_FIRST and o_ev[0] == "uri" \
                    and o_ev[1] == RDF_NIL:
                self._sink("()")
                return
            if o_ev[0] == "uri" and o_ev[1] == RDF_NIL:
                # rdf:rest nil — end of list
                self._sep(S_LIST_R)
                self._pop_ctx()
                return
            if p_ev[1] == RDF_FIRST:
                self._write_node(o_ev, "object", flags)
            else:
                self._sep(S_LIST_SEP)
                if flags & (ANON_O_BEGIN | LIST_O_BEGIN):
                    self._push_ctx(
                        CTX_LIST if flags & LIST_O_BEGIN else CTX_BLANK,
                        out_graph, o_ev, None)
                return
        elif s_ev == self.ctx[2]:
            if p_ev == self.ctx[3]:
                # Elide S P
                last = self.last_sep
                anon_o = flags & ANON_O_BEGIN
                list_o = flags & LIST_O_BEGIN
                before_name = not anon_o and not list_o
                after_end = last in (S_ANON_R, S_LIST_R)
                self._sep(S_END_O_N if before_name
                          else (S_END_O_AA if after_end else S_END_O_NA))
            else:
                # Elide S
                first = self.ctx[3] is None
                self._sep(S_S_P if first else S_END_P)
                self._write_pred(p_ev)
            self._write_node(o_ev, "object", flags)
        else:
            # New subject
            if self.stack:
                raise ValueError("new subject inside anonymous context")
            if self.ctx[2] is not None:
                self._sep(S_STOP)
            if self.last_sep == S_STOP:
                self._newline()
            self._write_node(s_ev, "subject", flags)
            if not (flags & LIST_S_BEGIN):
                self._sep(S_S_P)
            self._reset_ctx()
            self.ctx[2] = s_ev
            if not (flags & LIST_S_BEGIN):
                self._write_pred(p_ev)
            self._write_node(o_ev, "object", flags)

        if flags & (ANON_S_BEGIN | LIST_S_BEGIN):
            is_list = bool(flags & LIST_S_BEGIN)
            self._push_ctx(CTX_LIST if is_list else CTX_BLANK,
                           out_graph, s_ev, None if is_list else p_ev)
        if flags & (ANON_O_BEGIN | LIST_O_BEGIN):
            self._push_ctx(
                CTX_LIST if flags & LIST_O_BEGIN else CTX_BLANK,
                out_graph, o_ev, None)

    def end_anon(self, node_id: str) -> None:
        """writer.c:1195-1228 serd_writer_end_anon."""
        if not self.stack:
            return
        if self.ctx[4]:
            self.indent -= 1
            self.ctx[4] = False
        self._sep(S_ANON_R)
        self._pop_ctx()
        if self.ctx[2] is not None and self.ctx[2] == ("blank", node_id):
            self.ctx[3] = None

    def finish(self) -> str:
        self._terminate()
        return "".join(self.out)


def write_events(events: list[tuple], syntax: str = "turtle",
                 base_uri: str = "", root_uri: str = "",
                 chop_blank_prefix: str = "", qualify: bool = True,
                 ascii_: bool = False) -> str:
    """Replay a parser event stream through the writer (the serdi
    reader→writer pipeline, src/serdi.c:329-342)."""
    w = SerdiWriter(syntax=syntax, base_uri=base_uri, root_uri=root_uri,
                    chop_blank_prefix=chop_blank_prefix, qualify=qualify,
                    ascii_=ascii_)
    for ev in events:
        if ev[0] == "stmt":
            w.write_statement(ev[1], ev[2], ev[3], ev[4], ev[5])
        elif ev[0] == "end":
            w.end_anon(ev[1])
        elif ev[0] == "prefix":
            w.set_prefix(ev[1], ev[2], ev[3])
        elif ev[0] == "base":
            w.set_base(ev[1], ev[2])
    return w.finish()


def pretty_print(text, base_uri: str = "", trig: bool = False,
                 lax: bool = False, root_uri: str = "",
                 blank_prefix: str = "",
                 chop_blank_prefix: str = "",
                 qualify: bool = True) -> str:
    """Parse + re-serialize like ``serdi -i turtle -o turtle`` (the
    'pretty' suite round-trip: output reproduces input byte-exactly
    for serdi-formatted files)."""
    if isinstance(text, (bytes, bytearray)):
        from .chars import decode_rdf_text

        text, utf8_err = decode_rdf_text(text, lax)
        if utf8_err is not None:
            raise ValueError(f"bad UTF-8: {utf8_err}")
    p = EventParser(text, base_uri=base_uri, trig=trig, lax=lax,
                    blank_prefix=blank_prefix)
    _, errors = p.parse()
    if errors and not lax:
        raise ValueError(f"parse errors: {errors[:2]}")
    return write_events(p.events, syntax="trig" if trig else "turtle",
                        base_uri=base_uri, root_uri=root_uri,
                        chop_blank_prefix=chop_blank_prefix,
                        qualify=qualify)


def events_from_triples(triples) -> list[tuple]:
    """Synthesize a flag-less event stream from flat parsed triples
    (NTriples/NQuads input → abbreviating writer, the serdi
    `-i ntriples -o turtle` path).  No anon/list flags exist in flat
    input (abbreviate suite README), so blanks print as labels and
    only subject/predicate elision applies.  Literal long-string flags
    derive from value content (flat input can only introduce newlines/
    quotes via escapes; serd flags \\n/\\r ECHARs, which is exactly a
    newline char in the value — quote chars from \\" ECHARs do NOT set
    HAS_QUOTE in serd, so only newlines are flagged here)."""
    from .nodes import BLANK as _B, LITERAL as _L

    events = []
    for t in triples:
        if t.g is None:
            g_ev = None
        elif t.g.startswith("_:"):
            g_ev = ("blank", t.g[2:])
        else:
            g_ev = ("uri", t.g)
        s_ev = ("blank", t.s) if t.s_type == _B else ("uri", t.s)
        p_ev = ("uri", t.p)
        if t.o_type == _B:
            o_ev = ("blank", t.o)
        elif t.o_type == _L:
            nflags = HAS_NEWLINE if ("\n" in t.o or "\r" in t.o) else 0
            dt_ev = ("uri", t.o_datatype) if t.o_datatype else None
            o_ev = ("literal", t.o, dt_ev, t.o_lang, nflags)
        else:
            o_ev = ("uri", t.o)
        events.append(("stmt", 0, g_ev, s_ev, p_ev, o_ev))
    return events

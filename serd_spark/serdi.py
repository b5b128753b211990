"""serdi-equivalent CLI: convert RDF between syntaxes with the same
option surface, exit codes, and stderr behavior as the reference tool
(/root/reference/src/serdi.c:84-385; option matrix exercised by
test/meson.build:55-153).

This is the single-document (driver-side) surface — the distributed
pipeline CLI is ``serd_spark.pipeline``.  Both share the same parser
and writers, so the conformance suites gate this path too.

Usage: python -m serd_spark.serdi [OPTION]... INPUT [BASE_URI]
"""

from __future__ import annotations

import sys
from typing import Optional, TextIO

VERSION = "0.32.11"  # behavioral parity target (reference meson.build)

_SYNTAXES = {"turtle": ".ttl", "ntriples": ".nt",
             "nquads": ".nq", "trig": ".trig"}

_USAGE = """\
Usage: {prog} [OPTION]... INPUT [BASE_URI]
Read and write RDF syntax.
Use - for INPUT to read from standard input.

  -a           Write ASCII output if possible
  -b           Fast bulk output for large serialisations
  -c PREFIX    Chop PREFIX from matching blank node IDs
  -e           Eat input one character at a time
  -f           Keep full URIs in input (don't qualify)
  -h           Display this help and exit
  -i SYNTAX    Input syntax: turtle/ntriples/trig/nquads
  -l           Lax (non-strict) parsing
  -o SYNTAX    Output syntax: turtle/ntriples/trig/nquads
  -p PREFIX    Add PREFIX to blank node IDs
  -q           Suppress all output except data
  -r ROOT_URI  Keep relative URIs within ROOT_URI
  -s INPUT     Parse INPUT as string (terminates options)
  -v           Display version information and exit
"""


def _print_usage(prog: str, error: bool, out: TextIO, err: TextIO) -> int:
    os_ = err if error else out
    if error:
        os_.write("\n")
    os_.write(_USAGE.format(prog=prog))
    return 1 if error else 0


def _print_version(out: TextIO) -> int:
    out.write(f"serdi (serd_spark) {VERSION}\n")
    return 0


def _guess_syntax(filename: str) -> Optional[str]:
    dot = filename.rfind(".")
    if dot < 0:
        return None
    ext = filename[dot:].lower()
    for name, e in _SYNTAXES.items():
        if ext == e:
            return name
    return None


def main(argv: list[str], out: TextIO = None, err: TextIO = None,
         stdin: TextIO = None) -> int:
    out = out if out is not None else sys.stdout
    err = err if err is not None else sys.stderr
    stdin = stdin if stdin is not None else sys.stdin
    prog = argv[0] if argv else "serdi"

    def error(msg: str) -> None:
        err.write(f"serdi: {msg}\n")

    def missing_arg(opt: str) -> int:
        error(f"option requires an argument -- '{opt}'")
        return _print_usage(prog, True, out, err)

    in_syntax: Optional[str] = None
    out_syntax: Optional[str] = None
    from_file = True
    use_stdin = False
    ascii_ = False
    full_uris = False
    lax = False
    quiet = False
    add_prefix = ""
    chop_prefix = ""
    root_uri = ""

    a = 1
    argc = len(argv)
    while a < argc and from_file and argv[a].startswith("-"):
        if argv[a] == "-":
            use_stdin = True
            break
        if argv[a] == "--help":
            return _print_usage(prog, False, out, err)
        if argv[a] == "--version":
            return _print_version(out)
        o = 1
        arg = argv[a]
        while o < len(arg):
            opt = arg[o]
            if opt in "be":
                pass  # bulk write / byte-wise read: performance knobs
            elif opt == "a":
                ascii_ = True
            elif opt == "f":
                full_uris = True
            elif opt == "h":
                return _print_usage(prog, False, out, err)
            elif opt == "l":
                lax = True
            elif opt == "q":
                quiet = True
            elif opt == "v":
                return _print_version(out)
            elif opt == "s":
                from_file = False
                break
            elif opt in "ciopr":
                # argument must be the NEXT argv element (serdi.c
                # rejects '-cx' forms as a missing argument)
                a += 1
                if arg[o + 1:] or a == argc:
                    return missing_arg(opt)
                val = argv[a]
                if opt == "c":
                    chop_prefix = val
                elif opt == "p":
                    add_prefix = val
                elif opt == "r":
                    root_uri = val
                else:
                    if val not in _SYNTAXES:
                        error(f"unknown syntax '{val}'")
                        return _print_usage(prog, True, out, err)
                    if opt == "i":
                        in_syntax = val
                    else:
                        out_syntax = val
                break
            else:
                error(f"invalid option -- '{arg[1:]}'")
                return _print_usage(prog, True, out, err)
            o += 1
        a += 1

    if a >= argc:
        error("missing input")
        return _print_usage(prog, True, out, err)

    from .uri import file_uri_parse, node_new_file_uri

    in_name = "(string)"
    text: str
    input_arg = argv[a]
    a += 1
    base_uri = argv[a] if a < argc else ""

    if not from_file:
        text = input_arg
    elif use_stdin:
        in_name = "(stdin)"
        text = stdin.read()
    else:
        path = input_arg
        if path.startswith("file:"):
            try:
                path, _host = file_uri_parse(path)
            except Exception:
                error(f"bad file URI {input_arg!r}")
                return 1
        elif "://" in path:
            error(f"unsupported URI scheme {input_arg!r}")
            return 1
        in_name = path
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError as e:
            error(f"failed to open file {path} ({e.strerror})")
            return 1
        from .chars import decode_rdf_text

        text, utf8_err = decode_rdf_text(data, lax)
        if utf8_err is not None and not lax:
            if not quiet:
                error(f"{in_name}:{utf8_err[0]}: {utf8_err[1]}")
            return 1
        if not base_uri:
            base_uri = node_new_file_uri(path)

    if in_syntax is None:
        in_syntax = (_guess_syntax(in_name) or "trig") if from_file \
            else "trig"
    if out_syntax is None:
        out_syntax = ("ntriples" if in_syntax in ("turtle", "ntriples")
                      else "nquads")

    return _convert(text, in_name, in_syntax, out_syntax, base_uri,
                    ascii_=ascii_, full_uris=full_uris, lax=lax,
                    quiet=quiet, add_prefix=add_prefix,
                    chop_prefix=chop_prefix, root_uri=root_uri,
                    out=out, err=err)


def _convert(text: str, in_name: str, in_syntax: str, out_syntax: str,
             base_uri: str, *, ascii_: bool, full_uris: bool, lax: bool,
             quiet: bool, add_prefix: str, chop_prefix: str,
             root_uri: str, out: TextIO, err: TextIO) -> int:
    from .escapes import EscapeError

    def report(errors) -> None:
        if quiet:
            return
        for pos, msg in errors:
            err.write(f"serdi: {in_name}:{pos}: {msg}\n")

    try:
        if out_syntax in ("turtle", "trig"):
            if in_syntax in ("turtle", "trig"):
                from .writer_serdi import EventParser, write_events

                p = EventParser(text, base_uri=base_uri,
                                trig=(in_syntax == "trig"),
                                lax=lax, blank_prefix=add_prefix)
                _, errors = p.parse()
                events = p.events
            else:
                from .ntriples import parse_ntriples
                from .writer_serdi import events_from_triples

                triples, errors = parse_ntriples(
                    text, blank_prefix=add_prefix,
                    nquads=(in_syntax == "nquads"), lax=lax)
                errors = [(ln, m) for ln, m in errors]
                events = events_from_triples(triples)
            if errors and not lax:
                report(errors[:1])
                return 1
            report(errors)
            from .writer_serdi import write_events

            out.write(write_events(
                events, syntax=out_syntax, base_uri=base_uri,
                root_uri=root_uri, chop_blank_prefix=chop_prefix,
                qualify=not full_uris, ascii_=ascii_))
            return 0

        # ntriples/nquads output: streaming canonical lines
        from .writer import format_statement

        if in_syntax in ("turtle", "trig"):
            from .turtle import TurtleParser

            p = TurtleParser(text, base_uri=base_uri,
                             trig=(in_syntax == "trig"),
                             lax=lax, blank_prefix=add_prefix)
            triples, errors = p.parse()
        else:
            from .ntriples import parse_ntriples

            triples, errors = parse_ntriples(
                text, blank_prefix=add_prefix,
                nquads=(in_syntax == "nquads"), lax=lax)
        if errors and not lax:
            report(errors[:1])
            return 1
        report(errors)
        from .nodes import BLANK, URI
        from .uri import uri_is_absolute

        # serdi implies ASCII style for NTriples output (serdi.c
        # choose_style); NQuads stays UTF-8 unless -a
        use_ascii = ascii_ or out_syntax == "ntriples"
        drop_graph = out_syntax == "ntriples"
        def relative(t) -> bool:
            # canonical NT/NQ requires absolute IRIs: a relative URI
            # that survived parsing (no base given) is an error, as
            # in serdi's 'bad_string' input test (-s '<foo> a <Bar> .')
            for term, ty in ((t.s, t.s_type), (t.p, URI),
                             (t.o, t.o_type), (t.g, URI)):
                if term is not None and ty == URI \
                        and not term.startswith("_:") \
                        and not uri_is_absolute(term):
                    if not quiet:
                        err.write(f"serdi: {in_name}: unable to write "
                                  f"relative URI <{term}> without "
                                  "base\n")
                    return True
            return False

        for t in triples:
            if relative(t):
                if not lax:
                    return 1
                continue
            if drop_graph and t.g is not None:
                t = t._replace(g=None)
            if chop_prefix and t.s_type == BLANK and \
                    t.s.startswith(chop_prefix):
                t = t._replace(s=t.s[len(chop_prefix):])
            if chop_prefix and t.o_type == BLANK and \
                    t.o.startswith(chop_prefix):
                t = t._replace(o=t.o[len(chop_prefix):])
            out.write(format_statement(t, ascii_=use_ascii) + "\n")
        return 0
    except (ValueError, EscapeError) as e:
        if not quiet:
            err.write(f"serdi: {in_name}: {e}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))

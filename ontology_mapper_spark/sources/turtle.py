"""Dependency-free Turtle (TTL) reader for the ontology subset this engine
maps (SURVEY.md §2 S3; r2 VERDICT directive #7).

The reference delegates serialization tolerance to owlready2
(``term_collector.py:343-346`` — RDF/XML, OWL/XML, NTriples); this engine's
RDF/XML parser (``sources/owl.py``) covered only the dominant wire format,
so a Turtle file failed outright. This module parses the Turtle grammar
subset real exporters (Protégé, ROBOT, rdflib) emit for OWL ontologies:

- ``@prefix`` / ``PREFIX`` directives, prefixed names, ``<>`` IRIs
- ``a`` keyword, predicate-object lists (``;``), object lists (``,``)
- literals: short/long double-quoted strings with escapes, ``@lang`` tags,
  ``^^datatype`` suffixes, bare ``true``/``false``/numbers
- anonymous blank nodes ``[ ... ]`` (OWL restrictions) and collections
  ``( ... )`` (``owl:intersectionOf`` lists)

Output is a triple map ``{subject: {predicate: [object, ...]}}`` with
objects tagged ``('iri', i) | ('lit', text) | ('bnode', id) |
('list', [objects])`` — ``sources/owl.py`` assembles onto_terms rows from
it with the same semantics as the RDF/XML path (shared finalization, so a
.ttl and a .owl of the same ontology yield identical rows; pinned by
tests/test_owl_cache_cli.py round-trip).

NTriples is the line-based subset of Turtle (absolute IRIs, no prefixes,
one triple per line), so .nt files parse through the same grammar.
"""

from __future__ import annotations

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_PUNCT = set(";,()[].")
_NAME_STOP = set(' \t\r\n;,()[]"<>')


class TurtleParseError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    """-> [(kind, value)]; kinds: iri, lit, name, punct, at."""
    toks: list[tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "<":
            j = text.find(">", i)
            if j < 0:
                raise TurtleParseError(f"unterminated IRI at offset {i}")
            toks.append(("iri", text[i + 1:j]))
            i = j + 1
            continue
        if c == '"':
            if text.startswith('"""', i):
                j = text.find('"""', i + 3)
                while j > 0 and text[j - 1] == "\\":
                    j = text.find('"""', j + 1)
                if j < 0:
                    raise TurtleParseError(f"unterminated long string at {i}")
                raw, i = text[i + 3:j], j + 3
            else:
                j = i + 1
                while j < n:
                    if text[j] == "\\":
                        j += 2
                        continue
                    if text[j] == '"':
                        break
                    j += 1
                if j >= n:
                    raise TurtleParseError(f"unterminated string at {i}")
                raw, i = text[i + 1:j], j + 1
            # unescape the Turtle string escapes that matter for labels
            val = (
                raw.replace("\\\\", "\x00")
                .replace('\\"', '"')
                .replace("\\n", "\n")
                .replace("\\t", "\t")
                .replace("\\r", "\r")
                .replace("\x00", "\\")
            )
            # swallow @lang or ^^datatype suffix (kept out of the value —
            # the engine reads plain label/synonym text like the XML path)
            if i < n and text[i] == "@":
                i += 1
                while i < n and (text[i].isalnum() or text[i] == "-"):
                    i += 1
            elif text.startswith("^^", i):
                i += 2
                if i < n and text[i] == "<":
                    j = text.find(">", i)
                    i = j + 1
                else:
                    while i < n and text[i] not in _NAME_STOP:
                        i += 1
                    if i > 0 and text[i - 1] == ".":  # statement-final dot
                        i -= 1
            toks.append(("lit", val))
            continue
        if c in _PUNCT:
            if c == "." and i + 1 < n and text[i + 1].isdigit():
                # leading-dot decimal literal ('.5') — fall through to the
                # name tokenizer rather than emitting statement-final punct
                pass
            else:
                toks.append(("punct", c))
                i += 1
                continue
        if c == "@":
            j = i + 1
            while j < n and text[j].isalpha():
                j += 1
            toks.append(("at", text[i + 1:j].lower()))
            i = j
            continue
        # name token: prefixed name, bare keyword, or numeric literal
        j = i
        while j < n and text[j] not in _NAME_STOP:
            j += 1
        word = text[i:j]
        # a PN_LOCAL cannot end with '.', so trailing dots close statements
        while word.endswith("."):
            word = word[:-1]
            j -= 1
        if not word:
            raise TurtleParseError(f"stray '.' at offset {i}")
        toks.append(("name", word))
        i = j
    return toks


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.spo: dict[str, dict[str, list[tuple]]] = {}
        self._bn = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise TurtleParseError("unexpected end of input")
        self.i += 1
        return t

    def _expect(self, kind: str, value: str | None = None):
        t = self._next()
        if t[0] != kind or (value is not None and t[1] != value):
            raise TurtleParseError(f"expected {kind} {value or ''}, got {t}")
        return t

    def _new_bnode(self) -> str:
        self._bn += 1
        return f"_:b{self._bn}"

    def _resolve(self, name: str) -> str:
        if name == "a":
            return RDF_TYPE
        if ":" not in name:
            raise TurtleParseError(f"bare name {name!r} is not a valid term")
        pfx, local = name.split(":", 1)
        ns = self.prefixes.get(pfx)
        if ns is None:
            raise TurtleParseError(f"undeclared prefix {pfx!r}")
        return ns + local

    def _emit(self, s: str, p: str, o: tuple) -> None:
        self.spo.setdefault(s, {}).setdefault(p, []).append(o)

    def parse(self) -> dict[str, dict[str, list[tuple]]]:
        while self._peek() is not None:
            t = self._peek()
            if t[0] == "at" or (
                t[0] == "name" and t[1].upper() in ("PREFIX", "BASE")
            ):
                self._directive()
            else:
                was_bnode_list = self._peek() == ("punct", "[")
                s = self._subject()
                # Turtle allows a standalone blankNodePropertyList statement
                # '[ ... ] .' with no further predicates — OWLAPI/ROBOT emit
                # one per annotated axiom, so real exports hit this a lot
                if was_bnode_list and self._peek() == ("punct", "."):
                    self._next()
                    continue
                self._predicate_object_list(s)
                self._expect("punct", ".")
        return self.spo

    def _directive(self) -> None:
        kind = self._next()[1].lower()  # '@prefix'/'PREFIX' both land here
        if kind == "prefix":
            pname = self._next()
            if pname[0] != "name" or not pname[1].endswith(":"):
                raise TurtleParseError(f"bad @prefix name {pname}")
            iri = self._expect("iri")[1]
            self.prefixes[pname[1][:-1]] = iri
            if self._peek() == ("punct", "."):
                self._next()  # @prefix takes a dot; SPARQL PREFIX does not
        elif kind == "base":
            self._expect("iri")
            if self._peek() == ("punct", "."):
                self._next()
        else:
            raise TurtleParseError(f"unknown directive @{kind}")

    def _subject(self) -> str:
        t = self._next()
        if t[0] == "iri":
            return t[1]
        if t[0] == "name":
            if t[1].startswith("_:"):
                return t[1]  # labeled blank node keeps its id
            return self._resolve(t[1])
        if t == ("punct", "["):
            b = self._new_bnode()
            if self._peek() != ("punct", "]"):
                self._predicate_object_list(b)
            self._expect("punct", "]")
            return b
        raise TurtleParseError(f"bad subject {t}")

    def _predicate_object_list(self, s: str) -> None:
        while True:
            t = self._next()
            if t[0] == "iri":
                p = t[1]
            elif t[0] == "name":
                p = self._resolve(t[1])
            else:
                raise TurtleParseError(f"bad predicate {t}")
            while True:
                self._emit(s, p, self._object())
                if self._peek() == ("punct", ","):
                    self._next()
                    continue
                break
            if self._peek() == ("punct", ";"):
                self._next()
                # tolerate trailing ';' before '.' or ']'
                if self._peek() in (("punct", "."), ("punct", "]"), None):
                    return
                continue
            return

    def _object(self) -> tuple:
        t = self._next()
        if t[0] == "iri":
            return ("iri", t[1])
        if t[0] == "lit":
            return ("lit", t[1])
        if t[0] == "name":
            w = t[1]
            if w in ("true", "false"):
                return ("lit", w)
            if w.startswith("_:"):
                return ("bnode", w)
            if w[0].isdigit() or w[0] == "." or (w[0] in "+-" and len(w) > 1):
                return ("lit", w)  # numeric literal, kept as text
            return ("iri", self._resolve(w))
        if t == ("punct", "["):
            b = self._new_bnode()
            if self._peek() != ("punct", "]"):
                self._predicate_object_list(b)
            self._expect("punct", "]")
            return ("bnode", b)
        if t == ("punct", "("):
            items = []
            while self._peek() != ("punct", ")"):
                items.append(self._object())
            self._next()
            return ("list", items)
        raise TurtleParseError(f"bad object {t}")


def read_turtle(path: str) -> dict[str, dict[str, list[tuple]]]:
    """Parse a Turtle (or NTriples) file into ``{s: {p: [objects]}}``."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    return _Parser(_tokenize(text)).parse()

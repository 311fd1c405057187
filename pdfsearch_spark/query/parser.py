"""FTS5 MATCH-grammar parser (the query language the reference passes through
raw at /root/reference/routes/routes.go:78 → database/database.go:184).

Grammar semantics probe-verified against SQLite FTS5 (SURVEY.md §2.5 Q1 and
scripts/dev_probe_fts5.py):

- implicit AND between adjacent phrases; AND/NOT bind tighter than OR
- NOT is binary set-minus
- "quoted phrase" → positional adjacency; ``a + b`` concatenates into a phrase
- ``prefix*`` matches any index term with that prefix
- ``NEAR(p1 p2 ..., n)`` proximity group (default n=10)
- ``^phrase`` first-token anchor
- ``col:`` filters: only ``text`` is indexed; ``file_id``/``page_num`` are
  UNINDEXED → match nothing; unknown column → error
- parenthesized groups require an explicit operator on BOTH sides
  ('(a OR b) c' and 'c (a OR b)' are syntax errors)
- bare hyphen ('covid-19'), unbalanced quotes → errors (reference surfaces
  these as HTTP 400, routes/routes.go:96-103)

Scoring-relevant structure: the parse tree's leaves are Phrase nodes; BM25
needs each phrase's GLOBAL modifier-aware df and per-doc visible-instance
counts (probe: scripts/dev_probe_fts5.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class QuerySyntaxError(ValueError):
    """Mirrors FTS5 'fts5: syntax error' / 'no such column' (reference → 400)."""


@dataclass
class Phrase:
    """A scoring unit: one or more adjacent terms (already analyzer-stemmed).

    prefix=True only valid on the last term. anchored=True → first instance
    must start at token position 0.
    """

    terms: list[str]
    prefix: bool = False
    anchored: bool = False
    # column restriction: None = default (text); "unindexed" = matches nothing
    col: str | None = None
    index: int = -1  # position in the query's phrase list (scoring order)

    def key(self) -> tuple:
        return (tuple(self.terms), self.prefix, self.anchored, self.col)


@dataclass
class Node:
    op: str  # AND | OR | NOT | NEAR | PHRASE
    children: list["Node"] = field(default_factory=list)
    phrase: Phrase | None = None
    near_n: int = 10


_TOKEN_RE = re.compile(
    r"""
    \s*(
        \"(?P<quoted>[^\"]*)\"   # quoted phrase
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<star>\*)
      | (?P<colon>:)
      | (?P<caret>\^)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<comma>,)
      | (?P<word>[^\s()\"*:^+,-]+)
    )
    """,
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i = 0
    n = len(q)
    while i < n:
        m = _TOKEN_RE.match(q, i)
        if not m:
            rest = q[i:].strip()
            if not rest:
                break
            raise QuerySyntaxError(f"fts5: syntax error near {rest[:10]!r}")
        i = m.end()
        for kind in ("quoted", "lparen", "rparen", "star", "colon", "caret", "plus", "minus", "comma", "word"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    # unbalanced quote: odd number of '"' in raw string
    if q.count('"') % 2 == 1:
        raise QuerySyntaxError("fts5: syntax error: unterminated string")
    return toks


class _Parser:
    def __init__(self, q: str, analyzer) -> None:
        self.toks = _lex(q)
        self.pos = 0
        self.analyzer = analyzer  # str -> list[str] (fold+stem)
        self.fold = None  # set lazily for prefix folding (no stemming)
        self.phrases: list[Phrase] = []

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    # expr := and_expr (OR and_expr)*
    def parse(self) -> Node:
        node = self.parse_and()
        while True:
            kind, val = self.peek()
            if kind == "word" and val == "OR":
                self.next()
                rhs = self.parse_and()
                node = Node("OR", [node, rhs])
            else:
                break
        return node

    # and_expr := unit ((AND|NOT|implicit) unit)*   — left-assoc, same tier
    def parse_and(self) -> Node:
        node = self.parse_unit(primary=True)
        while True:
            kind, val = self.peek()
            if kind == "word" and val in ("AND", "NOT"):
                self.next()
                rhs = self.parse_unit(primary=True)
                node = Node(val, [node, rhs])
            elif (
                kind in ("word", "quoted", "caret", "colon", "minus")
                and not (kind == "word" and val == "OR")
            ):
                # implicit AND — but NOT after a group, and not before one
                if self.toks[self.pos - 1][0] == "rparen":
                    raise QuerySyntaxError(f"fts5: syntax error near {val!r}")
                rhs = self.parse_unit(primary=False)
                node = Node("AND", [node, rhs])
            elif kind == "lparen":
                raise QuerySyntaxError("fts5: syntax error near \"(\"")
            else:
                break
        return node

    def parse_unit(self, primary: bool) -> Node:
        kind, val = self.peek()
        if kind == "lparen":
            self.next()
            node = self.parse()
            k2, _ = self.next()
            if k2 != "rparen":
                raise QuerySyntaxError("fts5: syntax error: expected ')'")
            return node
        if kind == "word" and val == "NEAR":
            return self.parse_near()
        return Node("PHRASE", phrase=self.parse_phrase())

    def parse_near(self) -> Node:
        self.next()  # NEAR
        k, _ = self.next()
        if k != "lparen":
            raise QuerySyntaxError("fts5: syntax error near \"NEAR\"")
        children: list[Node] = []
        near_n = 10
        while True:
            kind, val = self.peek()
            if kind == "rparen":
                self.next()
                break
            if kind == "comma":
                self.next()
                k2, v2 = self.next()
                if k2 != "word" or not v2.isdigit():
                    raise QuerySyntaxError("fts5: syntax error in NEAR")
                near_n = int(v2)
                k3, _ = self.next()
                if k3 != "rparen":
                    raise QuerySyntaxError("fts5: syntax error in NEAR")
                break
            if kind is None:
                raise QuerySyntaxError("fts5: syntax error: unterminated NEAR")
            children.append(Node("PHRASE", phrase=self.parse_phrase()))
        if not children:
            raise QuerySyntaxError("fts5: syntax error: empty NEAR")
        return Node("NEAR", children, near_n=near_n)

    def parse_phrase(self) -> Phrase:
        anchored = False
        col: str | None = None
        kind, val = self.peek()
        if kind == "minus":
            # '-col: ...' / bare hyphen — reference behavior is an error
            self.next()
            k2, v2 = self.peek()
            raise QuerySyntaxError(f"no such column: {v2 if k2=='word' else '-'}")
        if kind == "caret":
            self.next()
            anchored = True
            kind, val = self.peek()
        # column filter: word ':' ...
        if kind == "word" and self.pos + 1 < len(self.toks) and self.toks[self.pos + 1][0] == "colon":
            colname = val
            if colname in ("AND", "OR", "NOT", "NEAR"):
                raise QuerySyntaxError(f"fts5: syntax error near {colname!r}")
            self.next()
            self.next()
            if colname == "text":
                col = None
            elif colname in ("file_id", "page_num"):
                col = "unindexed"
            else:
                raise QuerySyntaxError(f"no such column: {colname}")
            kind, val = self.peek()
            if kind == "caret":
                self.next()
                anchored = True
                kind, val = self.peek()

        terms: list[str] = []
        prefix = False
        while True:
            kind, val = self.peek()
            if kind == "quoted":
                self.next()
                terms.extend(self.analyzer(val))
            elif kind == "word":
                if val in ("AND", "OR", "NOT", "NEAR"):
                    break
                self.next()
                stemmed = self.analyzer(val)
                # check prefix star immediately after
                k2, _ = self.peek()
                if k2 == "star":
                    self.next()
                    # prefix tokens are folded but NOT stemmed (FTS5 passes
                    # prefix tokens to the tokenizer with the PREFIX flag,
                    # which skips the porter wrapper) — probe-verified in
                    # tests/test_search.py
                    folded = self.fold(val) if self.fold else [val.lower()]
                    terms.extend(folded)
                    prefix = True
                    break
                terms.extend(stemmed)
            elif kind == "minus":
                # hyphen inside a bareword sequence: 'covid-19'
                self.next()
                k2, v2 = self.peek()
                raise QuerySyntaxError(f"no such column: {v2 if k2=='word' else '-'}")
            else:
                break
            # '+' concatenation continues the phrase
            k2, _ = self.peek()
            if k2 == "plus":
                self.next()
                continue
            if not prefix:
                break
        if not terms:
            raise QuerySyntaxError("fts5: syntax error: empty phrase")
        ph = Phrase(terms=terms, prefix=prefix, anchored=anchored, col=col)
        ph.index = len(self.phrases)
        self.phrases.append(ph)
        return ph


def parse_query(q: str, analyzer, fold=None) -> tuple[Node, list[Phrase]]:
    """Parse a raw MATCH query. ``analyzer``: str → list of stemmed terms;
    ``fold``: str → folded-not-stemmed terms (for prefixes).
    Raises QuerySyntaxError exactly where the oracle raises."""
    p = _Parser(q, analyzer)
    p.fold = fold
    if not p.toks:
        raise QuerySyntaxError("fts5: syntax error: empty query")
    node = p.parse()
    if p.pos != len(p.toks):
        k, v = p.toks[p.pos]
        raise QuerySyntaxError(f"fts5: syntax error near {v!r}")
    return node, p.phrases

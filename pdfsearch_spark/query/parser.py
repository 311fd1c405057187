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


# Sentinel for an empty quoted phrase ('""'): a valid FTS5 phrase that
# matches nothing. U+E000 is private-use (never a unicode61 token char), so
# it can never appear in the index.
NOMATCH_TERM = ""


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
      | (?P<lbrace>\{)
      | (?P<rbrace>\})
      | (?P<word>[^\s()\"*:^+,{}-]+)
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
        for kind in ("quoted", "lparen", "rparen", "star", "colon", "caret", "plus", "minus", "comma", "lbrace", "rbrace", "word"):
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

    # and_expr := seq ((AND|NOT) seq)*   — left-assoc, same tier.
    # A juxtaposed phrase SEQUENCE is one operand (fts5parse.y: exprlist),
    # so 'a NOT b c' is a NOT (b AND c) — probe-verified: the oracle returns
    # the a-minus-(b∧c) row count, not ((a NOT b) ∧ c)'s.
    def parse_and(self) -> Node:
        node = self.parse_seq()
        while True:
            kind, val = self.peek()
            if kind == "word" and val in ("AND", "NOT"):
                self.next()
                rhs = self.parse_seq()
                node = Node(val, [node, rhs])
            else:
                break
        return node

    # seq := unit (unit)*   — implicit AND between adjacent phrases; binds
    # tighter than the explicit operators. Parenthesized GROUPS cannot
    # juxtapose — '(a OR b) c' and 'c (a OR b)' are fts5 syntax errors —
    # but NEAR(...) is a phrase-level atom and juxtaposes freely
    # ('NEAR(a b, 2) c' is legal).
    def parse_seq(self) -> Node:
        node = self.parse_unit(primary=True)
        was_group = self.last_was_group
        while True:
            kind, val = self.peek()
            if (
                kind in ("word", "quoted", "caret", "colon", "minus", "lbrace")
                and not (kind == "word" and val in ("OR", "AND", "NOT"))
            ):
                if was_group:
                    raise QuerySyntaxError(f"fts5: syntax error near {val!r}")
                rhs = self.parse_unit(primary=False)
                if self.last_was_group:
                    # a colset-group on the right of a juxtaposition:
                    # 'alpha text:(beta)' is an fts5 syntax error [probe]
                    raise QuerySyntaxError('fts5: syntax error near "("')
                node = Node("AND", [node, rhs])
            elif kind == "lparen":
                raise QuerySyntaxError("fts5: syntax error near \"(\"")
            else:
                break
        return node

    # set by parse_unit: True when the unit was a parenthesized group
    # (bare or colset-prefixed) — groups cannot juxtapose on either side
    last_was_group = False

    def _try_colset(self):
        """Consume a leading column-set ('col:', '-col:', '{..}:',
        '-{..}:') if one starts at the cursor; return its restriction, or
        _NO_COL with the cursor unmoved. Used by parse_unit to spot
        colset-prefixed NEAR groups / parenthesized exprs [probe: FTS5
        accepts 'text:NEAR(a b, 2)' and 'text:(a OR b)']."""
        k, v = self.peek()
        save = self.pos
        if k == "minus":
            self.next()
            k2, v2 = self.peek()
            if (
                k2 == "word"
                and self.pos + 1 < len(self.toks)
                and self.toks[self.pos + 1][0] == "colon"
            ):
                self.next()
                self.next()
                return self._colset([v2], negated=True)
            if k2 == "lbrace":
                return self._braced_colset(negated=True)
            self.pos = save
            return _NO_COL
        if (
            k == "word"
            and v not in ("AND", "OR", "NOT", "NEAR")
            and self.pos + 1 < len(self.toks)
            and self.toks[self.pos + 1][0] == "colon"
        ):
            self.next()
            self.next()
            return self._colset([v], negated=False)
        if k == "lbrace":
            return self._braced_colset(negated=False)
        return _NO_COL

    def parse_unit(self, primary: bool) -> Node:
        kind, val = self.peek()
        self.last_was_group = False
        if kind == "lparen":
            self.next()
            node = self.parse()
            k2, _ = self.next()
            if k2 != "rparen":
                raise QuerySyntaxError("fts5: syntax error: expected ')'")
            self.last_was_group = True
            return node
        if kind == "word" and val == "NEAR":
            return self.parse_near()
        # colset-prefixed NEAR group or parenthesized expr: the restriction
        # distributes over every phrase inside, INTERSECTING with any inner
        # colset [probe: 'file_id:(text:alpha)' matches nothing]
        save = self.pos
        col = self._try_colset()
        if col is not _NO_COL:
            k2, v2 = self.peek()
            if k2 == "lparen":
                self.next()
                node = self.parse()
                k3, _ = self.next()
                if k3 != "rparen":
                    raise QuerySyntaxError("fts5: syntax error: expected ')'")
                _apply_col(node, col)
                self.last_was_group = True
                return node
            if k2 == "word" and v2 == "NEAR":
                node = self.parse_near()
                _apply_col(node, col)
                return node
            # plain colset phrase: rewind and let parse_phrase own it (it
            # also enforces caret-after-colset ordering)
            self.pos = save
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
            children.append(
                Node("PHRASE", phrase=self.parse_phrase(in_near=True))
            )
        if not children:
            raise QuerySyntaxError("fts5: syntax error: empty NEAR")
        return Node("NEAR", children, near_n=near_n)

    COLS = ("file_id", "page_num", "text")

    def _colset(self, names: list[str], negated: bool) -> str | None:
        """Effective restriction from a column set (order: reference DDL).
        Returns None = text included (default scoring col); 'unindexed' =
        only UNINDEXED columns remain → matches nothing."""
        for c in names:
            if c not in self.COLS:
                raise QuerySyntaxError(f"no such column: {c}")
        eff = set(self.COLS) - set(names) if negated else set(names)
        return None if "text" in eff else "unindexed"

    def _braced_colset(self, negated: bool) -> str | None:
        """'{col col ...}:' — already peeked at lbrace."""
        self.next()  # {
        names: list[str] = []
        while True:
            k, v = self.next()
            if k == "rbrace":
                break
            if k != "word":
                raise QuerySyntaxError("fts5: syntax error in column set")
            names.append(v)
        k, _ = self.next()
        if k != "colon":
            raise QuerySyntaxError("fts5: syntax error: expected ':'")
        if not names:
            raise QuerySyntaxError("fts5: syntax error: empty column set")
        return self._colset(names, negated)

    def parse_phrase(self, in_near: bool = False) -> Phrase:
        anchored = False
        col: str | None = None
        kind, val = self.peek()
        if in_near and kind in ("caret", "minus", "lbrace"):
            # NEAR members are plain phrases: no anchors, no column filters
            # [probe: 'NEAR(^a b, 2)' and 'NEAR(text:a b, 2)' are errors]
            raise QuerySyntaxError(f"fts5: syntax error near {val!r}")
        if kind == "minus":
            # '-col:' / '-{col ...}:' — negated column filter; a bare hyphen
            # ('covid-19') is the reference's "no such column" error
            self.next()
            k2, v2 = self.peek()
            if k2 == "word" and self.pos + 1 < len(self.toks) and self.toks[self.pos + 1][0] == "colon":
                self.next()
                self.next()
                col = self._colset([v2], negated=True)
                kind, val = self.peek()
            elif k2 == "lbrace":
                col = self._braced_colset(negated=True)
                kind, val = self.peek()
            else:
                raise QuerySyntaxError(f"no such column: {v2 if k2=='word' else '-'}")
        if kind == "caret":
            self.next()
            anchored = True
            kind, val = self.peek()
            # a column filter may not FOLLOW the anchor [probe: '^text:a'
            # errors near ':'; 'text:^a' is the legal order]
            if (
                kind == "word"
                and self.pos + 1 < len(self.toks)
                and self.toks[self.pos + 1][0] == "colon"
            ) or kind == "lbrace":
                raise QuerySyntaxError('fts5: syntax error near ":"')
        # column filter: word ':' ...   or   '{col col}:' ...
        if (
            col is None
            and not in_near
            and kind == "word"
            and self.pos + 1 < len(self.toks)
            and self.toks[self.pos + 1][0] == "colon"
        ):
            colname = val
            if colname in ("AND", "OR", "NOT", "NEAR"):
                raise QuerySyntaxError(f"fts5: syntax error near {colname!r}")
            self.next()
            self.next()
            col = self._colset([colname], negated=False)
            kind, val = self.peek()
            if kind == "caret":
                self.next()
                anchored = True
                kind, val = self.peek()
        elif col is None and kind == "lbrace":
            col = self._braced_colset(negated=False)
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
                stemmed = self.analyzer(val)
                # phrase-prefix: '"a b"*' (whitespace before '*' allowed) —
                # the LAST token becomes a folded-not-stemmed prefix token
                k2, _ = self.peek()
                if k2 == "star":
                    self.next()
                    # prefix tokens are analyzed EXACTLY like regular tokens
                    # (folded + porter-stemmed), then string-prefix-matched
                    # against index terms — probe: 'running*' == 'run*',
                    # 'coöperate*' == 'coop*' (scripts/dev_probe_fts5.py)
                    if stemmed:
                        terms.extend(stemmed)
                    else:
                        terms.append(NOMATCH_TERM)
                    prefix = True
                    break
                if not stemmed:
                    # '""' / whitespace-only phrase: valid, matches nothing
                    terms.append(NOMATCH_TERM)
                else:
                    terms.extend(stemmed)
            elif kind == "word":
                if val in ("AND", "OR", "NOT", "NEAR"):
                    break
                self.next()
                stemmed = self.analyzer(val)
                # check prefix star immediately after
                k2, _ = self.peek()
                if k2 == "star":
                    self.next()
                    # prefix tokens are analyzed exactly like regular tokens
                    # (folded + porter-stemmed) before string-prefix match —
                    # probe: 'running*' == 'run*', 'failure*' == 'failur*'
                    if stemmed:
                        terms.extend(stemmed)
                    else:
                        terms.append(NOMATCH_TERM)
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
        # empty quoted phrases vanish from concatenations ('renal + ""' ==
        # 'renal'); a phrase of ONLY empties stays as one sentinel so the
        # tree-level pruning below can drop it
        real = [t for t in terms if t != NOMATCH_TERM]
        terms = real if real else [NOMATCH_TERM]
        ph = Phrase(terms=terms, prefix=prefix, anchored=anchored, col=col)
        ph.index = len(self.phrases)
        self.phrases.append(ph)
        return ph


_NO_COL = object()  # _try_colset sentinel: "no column set at the cursor"


def _apply_col(node: Node, col: str | None) -> None:
    """Distribute an outer column restriction over every phrase under
    `node`, INTERSECTING with inner restrictions [probe:
    'file_id:(text:alpha)' matches nothing — the sets intersect to ∅].
    In the two-value lattice the evaluator consumes (text included /
    'unindexed'), intersection is: anything ∩ unindexed = unindexed,
    x ∩ text-included = x — so a text-including outer col is a no-op."""
    if col is None:
        return
    if node.op == "PHRASE":
        node.phrase.col = "unindexed"
    elif node.op == "NEAR":
        for c in node.children:
            c.phrase.col = "unindexed"
    else:
        for c in node.children:
            _apply_col(c, col)


def _is_empty_phrase(node: Node) -> bool:
    return node.op == "PHRASE" and node.phrase.terms == [NOMATCH_TERM]


def _prune_empty(node: Node) -> Node | None:
    """Drop empty phrases ('""') — probe-verified: they are no-ops wherever
    they appear (AND/OR/NOT rhs/NEAR member); a query REDUCING to only empty
    phrases matches nothing ('"" NOT renal' → 0 rows)."""
    if node.op == "PHRASE":
        return None if _is_empty_phrase(node) else node
    if node.op == "NEAR":
        kept = [c for c in node.children if not _is_empty_phrase(c)]
        if not kept:
            return None
        if len(kept) == 1:
            return kept[0]
        node.children = kept
        return node
    a = _prune_empty(node.children[0])
    b = _prune_empty(node.children[1])
    if node.op in ("AND", "OR"):
        if a is None:
            return b
        if b is None:
            return a
    else:  # NOT
        if a is None:
            return None
        if b is None:
            return a
    node.children = [a, b]
    return node


def _collect_phrases(node: Node, acc: set[int]) -> None:
    if node.op == "PHRASE":
        acc.add(id(node.phrase))
    elif node.op == "NEAR":
        for c in node.children:
            acc.add(id(c.phrase))
    else:
        for c in node.children:
            _collect_phrases(c, acc)


def parse_query(q: str, analyzer, fold=None) -> tuple[Node | None, list[Phrase]]:
    """Parse a raw MATCH query. ``analyzer``: str → list of stemmed terms;
    ``fold``: kept for API compat (prefixes are stemmed like everything else).
    Raises QuerySyntaxError exactly where the oracle raises. Returns
    (None, []) when the query prunes to nothing (matches no rows)."""
    p = _Parser(q, analyzer)
    p.fold = fold
    if not p.toks:
        raise QuerySyntaxError("fts5: syntax error: empty query")
    node = p.parse()
    if p.pos != len(p.toks):
        k, v = p.toks[p.pos]
        raise QuerySyntaxError(f"fts5: syntax error near {v!r}")
    node = _prune_empty(node)
    if node is None:
        return None, []
    alive: set[int] = set()
    _collect_phrases(node, alive)
    phrases = [ph for ph in p.phrases if id(ph) in alive]
    for i, ph in enumerate(phrases):
        ph.index = i
    return node, phrases

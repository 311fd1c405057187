"""FTS5 ``snippet()`` re-implementation (reference calls it twice per result
row: N=16 → title, N=60 → text, /root/reference/database/database.go:180-181).

Algorithm (SQLite fts5_aux.c behavior, golden-tested against the oracle):
pick the ≤N-token window over the column maximizing a coverage score where
the first instance of each distinct phrase counts heavily and repeats count
lightly; render the window from the ORIGINAL text (offsets preserved),
wrapping each phrase instance in open/close markers; ellipsis at trimmed
edges. Runs over ≤ top-k rows only, inside a pandas UDF.
"""

from __future__ import annotations

import pandas as pd

from ..analyzer import _tables
from ..porter import stem as porter_stem


def tokenize_offsets(text: str) -> list[tuple[str, int, int]]:
    """(stemmed_term, start_char, end_char) per token, FTS5-identical
    sequence (same fold tables + porter)."""
    table = _tables()
    out: list[tuple[str, int, int]] = []
    n = len(text)
    i = 0
    while i < n:
        cp = ord(text[i])
        repl = table[cp]
        if repl == " ":
            i += 1
            continue
        j = i
        folded: list[str] = []
        while j < n:
            r = table[ord(text[j])]
            if r == " ":
                break
            folded.append(r)
            j += 1
        term = "".join(folded)
        if term:
            out.append((porter_stem(term), i, j))
        i = j if j > i else i + 1
    return out


def find_phrase_instances(
    terms: list[str], phrase_slots: list[list[frozenset[str]]], anchored: list[bool]
) -> list[list[tuple[int, int]]]:
    """Per phrase: list of (start_tok, end_tok_exclusive) instances."""
    out: list[list[tuple[int, int]]] = []
    nt = len(terms)
    for slots, anc in zip(phrase_slots, anchored):
        inst: list[tuple[int, int]] = []
        L = len(slots)
        rng = [0] if anc else range(nt - L + 1)
        for s in rng:
            if s + L > nt:
                continue
            if all(terms[s + j] in slots[j] for j in range(L)):
                inst.append((s, s + L))
        out.append(inst)
    return out


def best_window(
    n_tokens: int, instances: list[list[tuple[int, int]]], n: int
) -> tuple[int, int]:
    """Choose snippet window [start, start+n). Score: first instance of each
    phrase = 1000, repeats = 1; earliest best window wins."""
    if n_tokens <= n:
        return 0, n_tokens
    events = []  # (tok, phrase_idx, is_first)
    for pi, inst in enumerate(instances):
        for order, (s, _e) in enumerate(inst):
            events.append((s, pi, order == 0))
    if not events:
        return 0, min(n, n_tokens)
    events.sort()
    best_score = -1
    best_start = 0
    # candidate starts: each instance start (clamped)
    starts = sorted({min(max(0, s), n_tokens - n) for s, _, _ in events})
    for st in starts:
        en = st + n
        score = 0
        for s, pi, first in events:
            if st <= s < en:
                score += 1000 if first else 1
        if score > best_score:
            best_score = score
            best_start = st
    return best_start, min(best_start + n, n_tokens)


def make_snippet(
    text: str,
    phrase_slots: list[list[frozenset[str]]],
    anchored: list[bool],
    n: int,
    open_m: str = "<b>",
    close_m: str = "</b>",
    ellips: str = "...",
) -> str:
    toks = tokenize_offsets(text)
    terms = [t[0] for t in toks]
    instances = find_phrase_instances(terms, phrase_slots, anchored)
    st, en = best_window(len(toks), instances, n)
    if en <= st:
        return ""
    # char range of the window (trim leading/trailing separators)
    c0 = toks[st][1]
    c1 = toks[en - 1][2]
    # highlight phrase instances inside window
    marks: list[tuple[int, int]] = []  # char (open_at, close_at)
    for inst in instances:
        for s, e in inst:
            if s >= st and e <= en:
                marks.append((toks[s][1], toks[e - 1][2]))
    marks.sort()
    pieces: list[str] = []
    if st > 0:
        pieces.append(ellips)
    cur = c0
    for o, c in marks:
        if o < cur:
            continue
        pieces.append(text[cur:o])
        pieces.append(open_m)
        pieces.append(text[o:c])
        pieces.append(close_m)
        cur = c
    pieces.append(text[cur:c1])
    if en < len(toks):
        pieces.append(ellips)
    return "".join(pieces)


def snippet_series(
    texts: pd.Series,
    phrase_slots: list[list[frozenset[str]]],
    anchored: list[bool],
    n: int,
) -> pd.Series:
    return pd.Series(
        [make_snippet(t or "", phrase_slots, anchored, n) for t in texts],
        index=texts.index,
    )

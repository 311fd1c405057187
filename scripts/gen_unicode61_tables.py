"""Generate exact unicode61+remove_diacritics-2 tokenizer tables by probing
the SQLite FTS5 oracle (the tokenizer named in the reference DDL,
/root/reference/database/database.go:64).

unicode61's token-char classification and diacritic/case folding are pinned to
Unicode 6.1 data tables inside SQLite; Python's unicodedata tracks a newer
Unicode version, so deriving them from unicodedata would silently diverge.
Instead we probe every codepoint once against an in-process FTS5 table
(tokenize='unicode61 remove_diacritics 2', NO porter — stemming is layered
separately in analyzer.py) and record:

  - separator vs token char:  tokenize("a" + ch + "a") → 2 tokens vs 1 token
  - fold(ch) for token chars: tokenize(ch) → the emitted term ('' if the char
    is a token char that folds away, e.g. combining marks under
    remove_diacritics 2)

Output: pdfsearch_spark/data/unicode61_tables.npz
  kinds   uint8[0x110000]  0=separator, 1=token char
  folds   json dict {codepoint: folded_string} for token chars whose fold is
          not the identity (includes '' for fold-to-empty)

Run once; output is committed. Takes ~1-2 min.
"""

from __future__ import annotations

import json
import sqlite3
import sys
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "pdfsearch_spark" / "data" / "unicode61_tables.npz"

MAX_CP = 0x110000
BATCH = 50_000


def probe_all() -> tuple[np.ndarray, dict[int, str]]:
    con = sqlite3.connect(":memory:", isolation_level=None)
    con.execute(
        "CREATE VIRTUAL TABLE probe USING fts5(text, "
        "tokenize='unicode61 remove_diacritics 2')"
    )
    con.execute("CREATE VIRTUAL TABLE vocab USING fts5vocab(probe, 'instance')")

    valid = [
        cp
        for cp in range(1, MAX_CP)
        if not (0xD800 <= cp <= 0xDFFF)  # unpaired surrogates: unencodable
    ]

    # Pass 1: single-char probe → fold map for token chars with non-empty fold.
    folds: dict[int, str] = {}
    emitted = np.zeros(MAX_CP, dtype=bool)
    for i in range(0, len(valid), BATCH):
        chunk = valid[i : i + BATCH]
        con.execute("BEGIN")
        con.executemany(
            "INSERT INTO probe(rowid, text) VALUES (?, ?)",
            ((cp, chr(cp)) for cp in chunk),
        )
        con.execute("COMMIT")
        for term, doc in con.execute("SELECT term, doc FROM vocab"):
            emitted[doc] = True
            if term != chr(doc):
                folds[int(doc)] = term
        con.execute("DELETE FROM probe")
        print(f"pass1 {i + len(chunk)}/{len(valid)}", file=sys.stderr)

    # Pass 2: sandwich probe → separator vs token-char-folding-to-empty for
    # codepoints that emitted nothing in pass 1.
    kinds = np.zeros(MAX_CP, dtype=np.uint8)
    kinds[emitted] = 1
    unknown = [cp for cp in valid if not emitted[cp]]
    for i in range(0, len(unknown), BATCH):
        chunk = unknown[i : i + BATCH]
        con.execute("BEGIN")
        con.executemany(
            "INSERT INTO probe(rowid, text) VALUES (?, ?)",
            ((cp, "a" + chr(cp) + "a") for cp in chunk),
        )
        con.execute("COMMIT")
        # separator → terms ('a', doc) twice; token-char folding to empty →
        # single term 'aa'.
        joined: set[int] = set()
        for term, doc in con.execute("SELECT term, doc FROM vocab WHERE term='aa'"):
            joined.add(doc)
        for cp in joined:
            kinds[cp] = 1
            folds[int(cp)] = ""
        con.execute("DELETE FROM probe")
        print(f"pass2 {i + len(chunk)}/{len(unknown)}", file=sys.stderr)

    return kinds, folds


def main() -> None:
    kinds, folds = probe_all()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT,
        kinds=kinds,
        folds_json=np.frombuffer(
            json.dumps({str(k): v for k, v in sorted(folds.items())}).encode("utf-8"),
            dtype=np.uint8,
        ),
    )
    n_tok = int(kinds.sum())
    print(f"token chars: {n_tok}, folds: {len(folds)}, wrote {OUT}")


if __name__ == "__main__":
    main()

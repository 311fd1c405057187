"""In-process SQLite FTS5 oracle — the reference engine, reconstructed exactly.

Every search semantic the reference exposes is "SQLite FTS5 with
``tokenize='porter unicode61 remove_diacritics 2'`` plus two static SQL
statements" (DDL `/root/reference/database/database.go:59-66`, search SQL
`/root/reference/database/database.go:180-193`). Python's stdlib sqlite3
ships FTS5, so the oracle is the reference, bit-for-bit (SURVEY.md §5.2).

doc_id widening: the oracle stores our 64-bit FNV-1 ``doc_id`` in the
``file_id`` UNINDEXED column (the reference's 32-bit FNV-1 of path, widened
per SURVEY.md §1.2) so rank-identity is well-defined on both sides.
"""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass

import pandas as pd

from .fnv import fnv1_64_signed

# Exact reference DDL (database/database.go:59-66), modulo table name case.
DDL_PAGES = (
    "CREATE VIRTUAL TABLE IF NOT EXISTS pages USING fts5("
    "file_id UNINDEXED, page_num UNINDEXED, text, "
    "tokenize='porter unicode61 remove_diacritics 2')"
)
DDL_FILES = (
    "CREATE TABLE IF NOT EXISTS files ("
    "id INTEGER PRIMARY KEY, name TEXT NOT NULL, path TEXT NOT NULL UNIQUE)"
)

# Exact reference search SQL (database/database.go:180-184), LIMIT param'd.
SEARCH_SQL = """
SELECT DISTINCT file_id, page_num,
  snippet(pages, 2, '<b>', '</b>', '...', 16) as title,
  snippet(pages, 2, '<b>', '</b>', '...', 60) as text,
  files.name as base_name,
  rank
FROM pages
JOIN files ON pages.file_id = files.id
WHERE pages MATCH ?
ORDER BY rank
LIMIT ?
"""

SEARCH_SQL_BOOKS = """
SELECT DISTINCT file_id, page_num,
  snippet(pages, 2, '<b>', '</b>', '...', 16) as title,
  snippet(pages, 2, '<b>', '</b>', '...', 60) as text,
  files.name as base_name,
  rank
FROM pages
JOIN files ON pages.file_id = files.id
WHERE pages MATCH ? AND file_id IN ({ids})
ORDER BY rank
LIMIT ?
"""


@dataclass
class OracleResult:
    doc_id: int
    part: int
    title: str
    text: str
    base_name: str
    score: float


class FTS5Oracle:
    def __init__(self) -> None:
        self.con = sqlite3.connect(":memory:")
        self.con.execute(DDL_FILES)
        self.con.execute(DDL_PAGES)

    def load(self, docs: pd.DataFrame) -> None:
        """docs: columns (url, text) — text already extracted/cleaned.
        doc_id = FNV-1 64(url), part = 0 (SURVEY.md §1.3)."""
        rows = [
            (fnv1_64_signed(u), u.rsplit("/", 1)[-1], u)
            for u in docs["url"]
        ]
        self.con.executemany(
            "INSERT OR IGNORE INTO files(id, name, path) VALUES (?,?,?)", rows
        )
        self.con.executemany(
            "INSERT INTO pages(file_id, page_num, text) VALUES (?, 0, ?)",
            [(fnv1_64_signed(u), t) for u, t in zip(docs["url"], docs["text"])],
        )
        self.con.commit()

    def search(
        self, query: str, k: int = 200, book_ids: list[int] | None = None
    ) -> list[OracleResult]:
        """Reference /search semantics: raw query passed through unparsed.
        Raises sqlite3.OperationalError on grammar errors (reference → 400).
        Empty query returns [] (routes/routes.go:108-110)."""
        if not query:
            return []
        if book_ids:
            sql = SEARCH_SQL_BOOKS.format(ids=",".join("?" * len(book_ids)))
            args = [query, *book_ids, k]
        else:
            sql = SEARCH_SQL
            args = [query, k]
        out = [
            OracleResult(r[0], r[1], r[2], r[3], r[4], r[5])
            for r in self.con.execute(sql, args)
        ]
        # Reference tie order is nondeterministic insert order (SURVEY.md
        # §2.5 Q2-note); canonicalize by (score, doc_id) like the engine.
        out.sort(key=lambda r: (r.score, r.doc_id))
        return out

    def vocab_terms(self) -> pd.DataFrame:
        self.con.execute(
            "CREATE VIRTUAL TABLE IF NOT EXISTS _vocab USING fts5vocab(pages, 'row')"
        )
        return pd.read_sql_query("SELECT term, doc AS df, cnt FROM _vocab", self.con)

    def doc_terms(self, doc_id: int) -> list[str]:
        self.con.execute(
            "CREATE VIRTUAL TABLE IF NOT EXISTS _vinst USING fts5vocab(pages, 'instance')"
        )
        rowid = self.con.execute(
            "SELECT rowid FROM pages WHERE file_id=?", (doc_id,)
        ).fetchone()[0]
        return [
            r[0]
            for r in self.con.execute("SELECT term FROM _vinst WHERE doc=?", (rowid,))
        ]

"""Driver-side snippet parity check: our make_snippet vs FTS5 snippet() for
every (query, result-row) pair in the reference query set — byte equality."""

import sqlite3
import sys

import pandas as pd

from pdfsearch_spark import corpus
from pdfsearch_spark.analyzer import tokenize, unicode61_tokens
from pdfsearch_spark.extract import extract_text
from pdfsearch_spark.fnv import fnv1_64_signed
from pdfsearch_spark.oracle import FTS5Oracle
from pdfsearch_spark.query.parser import parse_query
from pdfsearch_spark.query.snippet import make_snippet

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250

pdf = corpus.gen_pandas(N)
pdf["text"] = [extract_text(h) for h in pdf["html"]]
ora = FTS5Oracle()
ora.load(pdf)
text_by_id = {fnv1_64_signed(u): t for u, t in zip(pdf["url"], pdf["text"])}
vocab = None

n_ok = n_tot = 0
fails = []
for q in [x["query"] for x in corpus.reference_queries() if not x["expect_error"] and x["query"]]:
    try:
        res = ora.search(q, k=200)
    except sqlite3.OperationalError:
        continue
    tree, phrases = parse_query(q, tokenize, unicode61_tokens)
    slots_list, anchored = [], []
    for p in phrases:
        if p.col == "unindexed":
            continue
        slots = [frozenset([t]) for t in p.terms]
        if p.prefix:
            if vocab is None:
                vocab = ora.vocab_terms()["term"].tolist()
            slots[-1] = frozenset(t for t in vocab if t.startswith(p.terms[-1]))
        slots_list.append(slots)
        anchored.append(p.anchored)
    for r in res:
        t = text_by_id[r.doc_id]
        for nn, want in ((16, r.title), (60, r.text)):
            got = make_snippet(t, slots_list, anchored, nn)
            n_tot += 1
            if got == want:
                n_ok += 1
            elif len(fails) < 8:
                fails.append((q, r.doc_id, nn, want, got))

for q, d, nn, want, got in fails:
    print(f"q={q!r} doc={d} n={nn}\n  oracle: {want!r}\n  engine: {got!r}")
print(f"{n_ok}/{n_tot} snippets byte-identical")
sys.exit(0 if n_ok == n_tot else 1)

"""Dev scratch: diff our analyzer against the FTS5 oracle on probe texts."""
import sqlite3

from pdfsearch_spark.analyzer import tokenize

texts = [
    "Café au lait with naïve résumé, coöperate running runs databases",
    "renal failure acute hypertension database run runner",
    "HYPERTENSION covid-19 the ½ mixed αλφα 漢字 coöperate",
    "probably logically geology rational relational abilities",
    "hello worldline sep ﬁligree straße",
    "ties dies agreed feed bled sing running hopping hopeful goodness",
    "caresses ponies caress cats plastered motoring sky conflated",
    "triplicate formative formalize electriciti electrical hopeful goodness",
    "revival allowance inference airliner gyroscopic adjustable defensible",
    "irritant replacement adjustment dependent adoption homologou communism",
    "activate angulariti homologi effective bowdlerize probate rate cease",
    "controll roll näive étude",
]

con = sqlite3.connect(":memory:")
con.execute("CREATE VIRTUAL TABLE p USING fts5(text, tokenize='porter unicode61 remove_diacritics 2')")
con.execute("CREATE VIRTUAL TABLE v USING fts5vocab(p, instance)")
for i, t in enumerate(texts):
    con.execute("INSERT INTO p(rowid, text) VALUES (?,?)", (i, t))
ok = True
for i, t in enumerate(texts):
    oracle = sorted(term for term, doc in con.execute("SELECT term, doc FROM v WHERE doc=?", (i,)))
    mine = sorted(tokenize(t))
    if oracle != mine:
        ok = False
        print("MISMATCH", ascii(t))
        print(" oracle", oracle)
        print(" mine  ", mine)
print("OK" if ok else "FAIL")

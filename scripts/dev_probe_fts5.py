"""Probe FTS5 semantics that the scorer must replicate: operator precedence,
phrase/prefix/NEAR/anchor tf+df for bm25, column filters, N/avgdl with empty
docs. Pure oracle introspection (public SQLite behavior)."""
import math
import sqlite3

con = sqlite3.connect(":memory:")
con.execute("CREATE VIRTUAL TABLE p USING fts5(file_id UNINDEXED, text, tokenize='porter unicode61 remove_diacritics 2')")
docs = {
    1: "alpha beta gamma",
    2: "alpha beta",
    3: "beta gamma",
    4: "alpha gamma delta",
    5: "gamma gamma alpha alpha beta beta beta",
    6: "delta",
    7: "",                      # empty doc: in N/avgdl?
    8: "alpha alpha alpha zeta alpha",
    9: "beta alpha other words beta alpha here",
}
for i, t in docs.items():
    con.execute("INSERT INTO p(rowid, file_id, text) VALUES (?,?,?)", (i, i, t))

def q(s):
    try:
        return con.execute("SELECT rowid, rank FROM p WHERE p MATCH ? ORDER BY rank, rowid", (s,)).fetchall()
    except sqlite3.OperationalError as e:
        return f"ERR: {e}"

print("== precedence ==")
print("'alpha OR beta AND delta' ->", q("alpha OR beta AND delta"))
print("'delta AND beta OR alpha' ->", q("delta AND beta OR alpha"))
print("'alpha OR gamma NOT delta' ->", q("alpha OR gamma NOT delta"))
print("'gamma NOT delta OR alpha' ->", q("gamma NOT delta OR alpha"))
print("'alpha beta OR delta' ->", q("alpha beta OR delta"))

print("== groups ==")
print("'(alpha OR beta) gamma' ->", q("(alpha OR beta) gamma"))
print("'gamma (alpha OR beta)' ->", q("gamma (alpha OR beta)"))
print("'(alpha OR beta) AND gamma' ->", q("(alpha OR beta) AND gamma"))

print("== column filters ==")
print("'text:alpha' ->", q("text:alpha"))
print("'file_id:1' ->", q("file_id:1"))
print("'nosuch:alpha' ->", q("nosuch:alpha"))
print("'covid-19' ->", q("covid-19"))

print("== scoring: single term 'alpha' ==")
# expected manual bm25: N=?, avgdl=? — print rank values & solve
rows = q("alpha")
print(rows)

# figure out N and avgdl FTS5 used: use doc 6 'delta' (tf=1, dl=1, df(delta)=2)
r = dict(q("delta"))
score6 = r[6]
k1, b = 1.2, 0.75
dls = {i: len(t.split()) for i, t in docs.items()}
N_real = len(docs)
avg_all = sum(dls.values()) / N_real
avg_nonempty = sum(dls.values()) / (N_real - 1)
for N, avgdl, label in [(N_real, avg_all, "N=9,avg incl empty"), (N_real - 1, avg_nonempty, "N=8,avg excl empty"), (N_real, avg_nonempty, "N=9,avg excl")]:
    idf = math.log((N - 2 + 0.5) / (2 + 0.5))
    idf = max(idf, 1e-6) if idf <= 0 else idf
    s = -(idf * 1 * (k1 + 1) / (1 + k1 * (1 - b + b * dls[6] / avgdl)))
    print(f"  {label}: predicted score6={s:.12f} actual={score6:.12f} match={abs(s-score6)<1e-9}")

print("== phrase df/tf: '\"beta alpha\"' ==")
rows = q('"beta alpha"')
print(rows)
# doc9 has 'beta alpha' twice; doc5 none... docs with phrase: 9 only? df_phrase=1
sc = dict(rows)
for df_hyp in [1, 2, 3]:
    idf = math.log((9 - df_hyp + 0.5) / (df_hyp + 0.5))
    idf = 1e-6 if idf <= 0 else idf
    for tf_hyp in [1, 2]:
        s = -(idf * tf_hyp * (k1 + 1) / (tf_hyp + k1 * (1 - b + b * dls[9] / avg_all)))
        if 9 in sc and abs(s - sc[9]) < 1e-9:
            print(f"  doc9 matches df={df_hyp}, tf={tf_hyp}, avgdl incl empty")
    for tf_hyp in [1, 2]:
        s = -(idf * tf_hyp * (k1 + 1) / (tf_hyp + k1 * (1 - b + b * dls[9] / avg_nonempty)))
        if 9 in sc and abs(s - sc[9]) < 1e-9:
            print(f"  doc9 matches df={df_hyp}, tf={tf_hyp}, avgdl EXCL empty")

print("== prefix: 'alp*' etc ==")
print("'alp*' ->", q("alp*"))
print("'gamm*' ->", q("gamm*"))
con.execute("INSERT INTO p(rowid, file_id, text) VALUES (10, 10, 'alpine alpha alphax')")
print("after adding doc10 'alpine alpha alphax': 'alp*' ->", q("alp*"))

print("== anchor ^ ==")
print("'^alpha' ->", q("^alpha"))  # docs starting with alpha: 1,2,4,8
print("'^beta' ->", q("^beta"))

print("== NEAR ==")
print("'NEAR(beta gamma, 1)' ->", q("NEAR(beta gamma, 1)"))
print("'NEAR(alpha delta, 0)' ->", q("NEAR(alpha delta, 0)"))
print("'NEAR(alpha delta, 1)' ->", q("NEAR(alpha delta, 1)"))

print("== NOT-side scoring ==")
print("'alpha NOT delta' ->", q("alpha NOT delta"))
print("'alpha' ->", q("alpha"))
# if scores of shared docs identical → NOT side contributes nothing

print("== implicit AND scoring vs 'alpha AND beta' ==")
print("'alpha beta' ->", q("alpha beta"))
print("'alpha AND beta' ->", q("alpha AND beta"))

print("== plus concat ==")
print("'beta + alpha' ->", q("beta + alpha"))

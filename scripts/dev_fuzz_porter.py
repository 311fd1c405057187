"""Dev scratch: exhaustive-ish fuzz of our analyzer vs the FTS5 oracle.

Random lowercase words biased toward Porter-relevant suffixes, plus short
words, y-placement cases, and long tokens around the 64-byte pass-through
boundary.
"""
import random
import sqlite3
import sys

from pdfsearch_spark.analyzer import tokenize

random.seed(987)

SUFFIXES = [
    "", "s", "ss", "sses", "ies", "eed", "ed", "ing", "y", "ational", "tional",
    "enci", "anci", "izer", "logi", "bli", "abli", "alli", "entli", "eli",
    "ousli", "ization", "ation", "ator", "alism", "iveness", "fulness",
    "ousness", "aliti", "iviti", "biliti", "icate", "ative", "alize", "iciti",
    "ical", "ful", "ness", "al", "ance", "ence", "er", "ic", "able", "ible",
    "ant", "ement", "ment", "ent", "ion", "sion", "tion", "ou", "ism", "ate",
    "iti", "ous", "ive", "ize", "e", "ee", "ll", "l", "at", "bl", "iz",
    "ying", "yed", "ies", "ily",
]
ALPHA = "abcdefghijklmnopqrstuvwxyz"

words = set()
for _ in range(120000):
    stem_len = random.randint(0, 8)
    stem = "".join(random.choice(ALPHA) for _ in range(stem_len))
    words.add(stem + random.choice(SUFFIXES))
for _ in range(20000):
    words.add("".join(random.choice(ALPHA) for _ in range(random.randint(1, 12))))
for n in range(55, 75):  # 64-byte boundary
    words.add("a" * n + "ing")
    words.add("b" * n + "s")
words.discard("")

words = sorted(words)
con = sqlite3.connect(":memory:")
con.execute("CREATE VIRTUAL TABLE p USING fts5(text, tokenize='porter unicode61 remove_diacritics 2')")
con.execute("CREATE VIRTUAL TABLE v USING fts5vocab(p, instance)")
con.executemany("INSERT INTO p(rowid, text) VALUES (?,?)", list(enumerate(words)))
bad = 0
for i, w in enumerate(words):
    oracle = sorted(row[0] for row in con.execute("SELECT term FROM v WHERE doc=?", (i,)))
    mine = sorted(tokenize(w))
    if oracle != mine:
        bad += 1
        if bad <= 25:
            print(f"MISMATCH {w!r}: oracle={oracle} mine={mine}")
print(f"{len(words)} words, {bad} mismatches")
sys.exit(1 if bad else 0)

"""Porter stemmer matching SQLite FTS5's `porter` tokenizer wrapper.

The reference's index semantics come entirely from its FTS5 DDL
(`/root/reference/database/database.go:59-66`,
``tokenize='porter unicode61 remove_diacritics 2'``), so our stemmer must
agree with FTS5's Porter implementation byte-for-byte. That implementation is
the classic Porter (1980) algorithm operating on the raw token bytes (UTF-8),
with vowels = ASCII aeiou(y): non-ASCII bytes behave as consonants and
non-English tokens pass through essentially unchanged.

Implemented from the published algorithm; every behavior here is validated
against the in-process FTS5 oracle by tests/test_analyzer.py (exhaustive
suffix-family fuzzing), which is what pins down the ambiguous variant choices
(e.g. step-2 'logi'→'log', 'bli'→'ble').

Tokens longer than 64 bytes are passed through unstemmed (FTS5's
FTS5_PORTER_MAX_TOKEN behavior, empirically confirmed by the tests).
"""

from __future__ import annotations

MAX_TOKEN = 64

_VOWELS = frozenset(b"aeiou")


def _is_cons(w: bytes, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == 0x79:  # 'y'
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: bytes, end: int) -> int:
    """Number of VC sequences in w[:end]."""
    n = 0
    i = 0
    while i < end and _is_cons(w, i):
        i += 1
    while i < end:
        while i < end and not _is_cons(w, i):
            i += 1
        if i >= end:
            break
        n += 1
        while i < end and _is_cons(w, i):
            i += 1
    return n


def _has_vowel(w: bytes, end: int) -> bool:
    return any(not _is_cons(w, i) for i in range(end))


def _double_cons(w: bytes) -> bool:
    # FTS5 quirk (oracle-fuzz-verified): in the double-consonant check 'y'
    # counts as a consonant unconditionally ('gayy' -> 'gay'), unlike the
    # contextual rule used everywhere else.
    return len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _VOWELS


def _cvc(w: bytes) -> bool:
    if len(w) < 3:
        return False
    i = len(w) - 1
    if not (_is_cons(w, i) and not _is_cons(w, i - 1) and _is_cons(w, i - 2)):
        return False
    return w[i] not in b"wxy"


def _replace_suffix(w: bytes, rules: list[tuple[bytes, bytes, int]]) -> bytes:
    """First matching suffix whose stem has measure > m_min is applied.

    FTS5 quirks (oracle-fuzz-verified): a rule is only *considered* when the
    word is strictly longer than the suffix (the generated C uses
    ``nBuf > len(suffix)`` guards), falling through to later/shorter rules
    otherwise; once a suffix matches with the guard satisfied, no further
    rules are tried even if the measure condition fails.
    """
    for suffix, repl, m_min in rules:
        if len(w) > len(suffix) and w.endswith(suffix):
            stem_len = len(w) - len(suffix)
            if _measure(w, stem_len) > m_min:
                return w[:stem_len] + repl
            return w
    return w


_STEP2 = [
    (b"ational", b"ate", 0),
    (b"tional", b"tion", 0),
    (b"enci", b"ence", 0),
    (b"anci", b"ance", 0),
    (b"izer", b"ize", 0),
    (b"logi", b"log", 0),
    (b"bli", b"ble", 0),
    (b"alli", b"al", 0),
    (b"entli", b"ent", 0),
    (b"eli", b"e", 0),
    (b"ousli", b"ous", 0),
    (b"ization", b"ize", 0),
    (b"ation", b"ate", 0),
    (b"ator", b"ate", 0),
    (b"alism", b"al", 0),
    (b"iveness", b"ive", 0),
    (b"fulness", b"ful", 0),
    (b"ousness", b"ous", 0),
    (b"aliti", b"al", 0),
    (b"iviti", b"ive", 0),
    (b"biliti", b"ble", 0),
]

_STEP3 = [
    (b"icate", b"ic", 0),
    (b"ative", b"", 0),
    (b"alize", b"al", 0),
    (b"iciti", b"ic", 0),
    (b"ical", b"ic", 0),
    (b"ful", b"", 0),
    (b"ness", b"", 0),
]

_STEP4 = [
    (b"al", b"", 1),
    (b"ance", b"", 1),
    (b"ence", b"", 1),
    (b"er", b"", 1),
    (b"ic", b"", 1),
    (b"able", b"", 1),
    (b"ible", b"", 1),
    (b"ant", b"", 1),
    (b"ement", b"", 1),
    (b"ment", b"", 1),
    (b"ent", b"", 1),
    # (b"ion", ...) handled specially: stem must end in 's' or 't'
    (b"ou", b"", 1),
    (b"ism", b"", 1),
    (b"ate", b"", 1),
    (b"iti", b"", 1),
    (b"ous", b"", 1),
    (b"ive", b"", 1),
    (b"ize", b"", 1),
]


def _step1a(w: bytes) -> bytes:
    # else-if chain with strict length guards, mirroring the generated C.
    if len(w) > 4 and w.endswith(b"sses"):
        return w[:-2]
    if len(w) > 3 and w.endswith(b"ies"):
        return w[:-2]
    if w.endswith(b"s") and w[-2:-1] != b"s":
        return w[:-1]
    return w


def _step1b(w: bytes) -> bytes:
    if len(w) > 3 and w.endswith(b"eed"):
        if _measure(w, len(w) - 3) > 0:
            return w[:-1]
        return w
    fired = False
    if len(w) > 2 and w.endswith(b"ed"):
        if _has_vowel(w, len(w) - 2):
            w = w[:-2]
            fired = True
    elif len(w) > 3 and w.endswith(b"ing"):
        if _has_vowel(w, len(w) - 3):
            w = w[:-3]
            fired = True
    if fired:
        if w.endswith(b"at") or w.endswith(b"bl") or w.endswith(b"iz"):
            return w + b"e"
        if _double_cons(w) and w[-1] not in b"lsz":
            return w[:-1]
        if _measure(w, len(w)) == 1 and _cvc(w):
            return w + b"e"
    return w


def _step1c(w: bytes) -> bytes:
    if w.endswith(b"y") and _has_vowel(w, len(w) - 1):
        return w[:-1] + b"i"
    return w


def _step4(w: bytes) -> bytes:
    # 'ion' rule: (m>1 and stem ends s/t) ION -> ''
    if len(w) > 3 and w.endswith(b"ion"):
        stem_len = len(w) - 3
        if w[stem_len - 1] in b"st" and _measure(w, stem_len) > 1:
            return w[:stem_len]
        return w
    return _replace_suffix(w, _STEP4)


def _step5a(w: bytes) -> bytes:
    if w.endswith(b"e"):
        m = _measure(w, len(w) - 1)
        if m > 1:
            return w[:-1]
        if m == 1 and not _cvc(w[:-1]):
            return w[:-1]
    return w


def _step5b(w: bytes) -> bytes:
    if w.endswith(b"ll") and _measure(w, len(w)) > 1:
        return w[:-1]
    return w


def stem_bytes(w: bytes) -> bytes:
    # FTS5 passes through over-long tokens (FTS5_PORTER_MAX_TOKEN) and tokens
    # shorter than 3 bytes ('as', 'ay' come back unstemmed from the oracle).
    if len(w) > MAX_TOKEN or len(w) < 3:
        return w
    return _step5b(_step5a(_step4(_replace_suffix(_replace_suffix(_step1c(_step1b(_step1a(w))), _STEP2), _STEP3))))


def stem(token: str) -> str:
    b = token.encode("utf-8", errors="surrogatepass")
    s = stem_bytes(b)
    try:
        return s.decode("utf-8")
    except UnicodeDecodeError:
        # A suffix rule truncated inside a multi-byte sequence (possible only
        # for exotic non-UTF8-safe byte tails); mirror bytes faithfully via
        # latin-1 round-trip is wrong for the index — fall back to the
        # unstemmed token, which FTS5 cannot have stemmed differently anyway.
        return token

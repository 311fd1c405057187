"""Extractor byte-identity (SURVEY.md §5.3-1).

clean_text must reproduce the Go normalization at
/root/reference/pdf/pdf.go:226-254 rune-for-rune; extract_text pins the
per-url byte-identity contract of BASELINE.json input_hint."""

from __future__ import annotations

import hashlib

from pdfsearch_spark import corpus
from pdfsearch_spark.extract import clean_text, extract_text

# Hand-derived goldens from the Go rules (pdf/pdf.go:226-254):
# - lines of only dots/digits after trim -> dropped (incl. empty/ws-only)
# - kept lines: keep runes in L* | N* | White_Space, drop the rest
# - every kept line is emitted with a trailing '\n'
CLEAN_GOLDENS = [
    ("", ""),
    ("   ", ""),
    ("12", ""),
    ("....", ""),
    ("1.2.3", ""),
    ("  42  ", ""),
    ("plain line", "plain line\n"),
    ("renal, failure; (acute)", "renal failure acute\n"),
    ("a.b", "ab\n"),  # dots survive the line test, dropped as runes
    ("covid-19", "covid19\n"),
    # Go IsNumber = Nd|Nl|No, so U+00BD (1/2) is kept; '-' dropped
    ("½ keeps No-category", "½ keeps Nocategory\n"),
    ("tab\tkept", "tab\tkept\n"),  # \t is White_Space
    ("nbsp kept", "nbsp kept\n"),  # U+00A0 White_Space
    ("fsdropped", "fsdropped\n"),  # U+001C: Python isspace yes, Go no
    ("nelkept", "nelkept\n"),  # U+0085 White_Space
    ("漢字 αλφα", "漢字 αλφα\n"),
    ("Café RÉSUMÉ", "Café RÉSUMÉ\n"),  # diacritics kept (tokenizer strips)
    ("multi\nline\n12\nkeep", "multi\nline\nkeep\n"),
    ("line\n\nline2", "line\nline2\n"),
]


def test_clean_text_goldens():
    for raw, want in CLEAN_GOLDENS:
        got = clean_text(raw)
        assert got == want, f"clean_text({raw!r}) = {got!r}, want {want!r}"


def test_clean_output_invariants():
    # output is empty or ends with '\n'; no disallowed runes survive
    import unicodedata

    from pdfsearch_spark.extract import _GO_SPACE

    for i in range(50):
        t = extract_text(corpus.gen_row(i)["html"])
        assert t == "" or t.endswith("\n")
        for ch in t:
            if ch == "\n":
                continue
            cat = unicodedata.category(ch)
            assert cat[0] in ("L", "N") or ch in _GO_SPACE, (
                f"disallowed rune {ch!r} ({cat}) in doc {i}"
            )


def test_extract_deterministic_per_url():
    """Same html bytes -> same extracted text, across repeated calls."""
    for i in (0, 7, 13, 99):
        h = corpus.gen_row(i)["html"]
        a = extract_text(h)
        b = extract_text(bytes(h))
        assert hashlib.sha256(a.encode()).hexdigest() == hashlib.sha256(b.encode()).hexdigest()


def test_extract_strips_markup():
    html = (
        b"<html><head><title>T</title></head><body><p>hello <b>bold</b> "
        b"&amp; &eacute;clair</p><script>var junk = 'not text';</script>"
        b"<p>world</p></body></html>"
    )
    t = extract_text(html)
    assert "junk" not in t and "script" not in t
    assert "hello" in t and "bold" in t and "world" in t
    assert "éclair" in t  # entity decoded
    assert "&" not in t  # & dropped by clean_text rune filter


def test_extract_invalid_utf8():
    bad = b"<html><body><p>ok \xff\xfe line</p></body></html>"
    t = extract_text(bad)
    assert "ok" in t and "line" in t  # never raises, bad bytes dropped/replaced

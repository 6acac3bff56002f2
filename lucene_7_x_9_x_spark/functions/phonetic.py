"""Phonetic analysis — American Soundex (the lucene/analysis/phonetic
module's PhoneticFilter with the commons-codec Soundex encoder;
solr-8.4.0/lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java).

American Soundex, the algorithm commons-codec implements:
  1. keep the first letter;
  2. h and w are SILENT after the first letter (removed before run
     collapsing, so same-coded consonants separated by h/w merge —
     "ashcraft" -> a261, the rule that distinguishes American Soundex
     from the naive variant);
  3. map letters to digit classes (bfpv=1 cgjkqsxz=2 dt=3 l=4 mn=5 r=6,
     vowels+y=0), collapse adjacent equal codes (including a code equal
     to the FIRST letter's code — "pfister" -> p236);
  4. drop the zeros (vowels separate runs but emit nothing), pad with
     zeros to first-letter + 3 digits.

Tokens with no letters (pure numbers) pass through unchanged — a
documented choice; the reference's encoder never sees them because its
tokenizers split classes apart.

Engine integration: AnalyzerConfig(phonetic="soundex") REPLACES each
token with its code (PhoneticFilter inject=false mode). The reference's
default inject=true emits code AND original at the same position; the
replace mode is the common search configuration (both query and index
sides run the same chain, so originals add nothing) — deviation
documented here and in COVERAGE.md.
"""

from __future__ import annotations

import re

_MAP = str.maketrans("abcdefghijklmnopqrstuvwxyz",
                     "01230120022455012623010202")
_NONLETTER = re.compile(r"[^a-z]")
_SILENT = re.compile(r"[hw]")
_RUNS = re.compile(r"(\d)\1+")


def soundex(token: str) -> str:
    """American Soundex code (first letter + 3 digits) of a lowercase
    token; tokens without letters pass through unchanged."""
    w = _NONLETTER.sub("", token)
    if not w:
        return token
    s = w[0] + _SILENT.sub("", w[1:])
    c = _RUNS.sub(r"\1", s.translate(_MAP))
    tail = c[1:].replace("0", "")
    return w[0] + (tail + "000")[:3]


def phonetic_tokens(ts: list, memo: dict) -> list:
    """Map a token list through soundex with a batch-wide vocab memo
    (one encode per DISTINCT token — same shape as stem_tokens)."""
    out = []
    for t in ts:
        if t is None:
            out.append(None)
            continue
        got = memo.get(t)
        if got is None:
            got = memo[t] = soundex(t)
        out.append(got)
    return out

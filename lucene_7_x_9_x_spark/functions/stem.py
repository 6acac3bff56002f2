"""Porter stemmer — the EnglishAnalyzer/PorterStemFilter capability
(solr-8.4.0/lucene/analysis/common/src/java/org/apache/lucene/analysis/
en/PorterStemFilter.java, PorterStemmer.java). Implemented from M.F.
Porter's published 1980 algorithm ("An algorithm for suffix stripping")
including the two departures of Porter's reference C implementation that
Lucene also follows (step 2: bli->ble instead of abli->able, plus
logi->log); behavior verified against the paper's published example
vectors in tests/test_stem.py.

Pure Python on purpose: stemming runs inside the tokenize Pandas UDF
where the per-batch vocabulary memo (stem_tokens) makes the amortized
cost one dict lookup per token — the same Arrow-batched shape as the
rest of the analysis chain."""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC){m}[V]: the number of vowel->consonant transitions."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    """*o: ends consonant-vowel-consonant where the final consonant is
    not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


def _rule(w: str, rules, cond) -> str | None:
    """Longest matching suffix wins; if its condition fails NO rule of the
    step applies (the paper's within-step selection discipline)."""
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is None:
        return None
    stem = w[: len(w) - len(best[0])]
    if cond(stem):
        return stem + best[1]
    return w


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"),
          ("bli", "ble"),            # departure (reference impl; was abli)
          ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
          ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
          ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
          ("biliti", "ble"),
          ("logi", "log")]           # departure (reference impl addition)

_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]

_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, fired = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, fired = w[:-3], True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    got = _rule(w, _STEP2, lambda s: _measure(s) > 0)
    if got is not None:
        w = got
    # step 3
    got = _rule(w, _STEP3, lambda s: _measure(s) > 0)
    if got is not None:
        w = got
    # step 4
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1 and (best != "ion" or stem.endswith(("s",
                                                                   "t"))):
            w = stem
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem_tokens(tokens: list, memo: dict) -> list:
    """Stem a token list through a shared vocabulary memo — amortizes to
    one dict hit per token across an Arrow batch (vocab << tokens)."""
    out = []
    for t in tokens:
        got = memo.get(t)
        if got is None and t is not None:
            got = memo[t] = porter_stem(t)
        out.append(got if t is not None else None)
    return out

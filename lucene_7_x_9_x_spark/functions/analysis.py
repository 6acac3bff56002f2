"""Analysis chain: StandardAnalyzer-equivalent, fully vectorized.

Reference semantics (behavior, not code):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:36-90
    pipeline = StandardTokenizer -> LowerCaseFilter -> StopFilter,
    default stopword set EMPTY, maxTokenLength = 255 (longer tokens split).
  solr-8.4.0/.../analysis/standard/StandardTokenizer.java:39-162 — UAX#29
    word-break. For source-code text we approximate with the word-char class
    [a-z0-9_]+ (applied after lowercasing); rank identity holds because the
    oracle (lucene_7_x_9_x_spark.oracle) and every SQL oracle use the SAME
    tokenizer definition (SURVEY.md §2.1 note).
  solr-8.4.0/.../analysis/StopFilter.java:28,104 — stopword holes keep
    position increments: we keep original position indices when masking.

All operations are pandas Series.str / numpy — no per-row Python in the
Spark path (the list comprehension in ``tokenize_series`` is over re.findall
results delivered by pandas' vectorized extract; see tokenize_to_flat for
the fully-flat variant used by the index builder).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

TOKEN_REGEX = r"[a-z0-9_]+"
MAX_TOKEN_LENGTH = 255

# ---------------------------------------------------------------------------
# Unicode word-char mode — the StandardTokenizer UAX#29 token-type behavior
# (solr-8.4.0/.../analysis/standard/StandardTokenizer.java:44-69: ALPHANUM
# runs, IDEOGRAPHIC/HIRAGANA one token per char, KATAKANA/HANGUL runs),
# expressed as ONE alternation over explicit codepoint ranges so the exact
# same pattern string runs identically under Python re (engine kernels),
# Java regex (any JVM-side path) and RE2 (DuckDB oracles:
# regexp_extract_all(lower(text), UNICODE_TOKEN_REGEX)).  Explicit ranges
# because \p{Han}-style classes don't exist in Python's re and \w is
# ASCII-only in RE2.  Documented approximation of the full UAX#29 DFA: no
# mid-number punctuation (3.14 -> '3','14') and Southeast-Asian scripts
# tokenize as runs rather than dictionary syllables (the reference needs
# whole analyzer modules for those: solr-8.4.0/lucene/analysis/
# smartcn|kuromoji|nori|icu).
_HAN = "一-鿿㐀-䶿豈-﫿"          # CJK ideographs
_HIRAGANA = "぀-ゟ"
_KATAKANA = "゠-ヿㇰ-ㇿ"                   # incl. ー
_HANGUL = "가-힯ᄀ-ᇿ㄰-㆏"
_UWORD = ("a-z0-9_"
          "À-ÖØ-öø-ÿ"        # Latin-1 letters
          "Ā-ɏ"                                  # Latin extended
          "Ͱ-Ͽἀ-῿"                     # Greek
          "Ѐ-ԯ"                                  # Cyrillic
          "֐-׿؀-ۿݐ-ݿ"        # Hebrew, Arabic
          "ऀ-ॿ"                                  # Devanagari
          "฀-๿")                                 # Thai
# UAX#29 NUM rule (StandardTokenizer.java:44-69 NUM token type, MidNum):
# digit runs joined by SINGLE interior '.' or ',' stay one token
# (3.14, 192.168.0.1, 1,000,000); a trailing separator is not consumed
# (no lookahead — RE2 has none — the (?:[.,][0-9]+)+ group only matches
# when digits follow). Leftmost-FIRST alternation is identical in
# Python re, Java regex and RE2 (none use POSIX longest-match here), so
# the NUM alternative leads; it requires at least one separator so plain
# digit/alnum runs (123abc) still tokenize via the word class exactly as
# before. Approximation kept: a LETTER-led run stops at punctuation
# (v1,5 -> v1, 5) where the full DFA would continue.
_NUM = "[0-9]+(?:[.,][0-9]+)+"
# UAX#29 EMOJI token type (StandardTokenizer.java:44-69 EMOJI; the DFA in
# StandardTokenizerImpl keeps extended-pictographic SEQUENCES as one
# token): a flag is a PAIR of regional indicators; a pictographic base
# may continue with variation selector U+FE0F, skin tones U+1F3FB-FF, or
# ZWJ-joined further pictographs; '1'+U+FE0F?+U+20E3 is a keycap.  All
# alternatives use literal code points (no \p, no \u escapes survive into
# the pattern string) so the SAME string runs identically under Python
# re, Java regex and RE2; the emoji alternative leads so keycaps win over
# the digit word-class at the same offset (leftmost-FIRST everywhere).
# Blocks covered: Misc Symbols/Dingbats (U+2600-27BF), Misc Pictographs /
# Emoticons / Transport (U+1F300-1F6FF), Supplemental+Extended-A
# (U+1F900-1F9FF, U+1FA70-1FAFF); regional indicators U+1F1E6-1F1FF.
_EMO = ("☀-➿"
        "\U0001F300-\U0001F6FF"
        "\U0001F900-\U0001F9FF"
        "\U0001FA70-\U0001FAFF")
_RI = "\U0001F1E6-\U0001F1FF"
_SKIN = "\U0001F3FB-\U0001F3FF"
_VS16, _ZWJ, _KEYCAP = "️", "‍", "⃣"
_EMOJI_SEQ = (f"[{_RI}][{_RI}]"
              f"|[{_EMO}](?:[{_VS16}{_SKIN}]|{_ZWJ}[{_EMO}])*"
              f"|[0-9#*]{_VS16}?{_KEYCAP}")
UNICODE_TOKEN_REGEX = (f"{_EMOJI_SEQ}"
                       f"|{_NUM}"
                       f"|[{_KATAKANA}]+"
                       f"|[{_HANGUL}]+"
                       f"|[{_HAN}{_HIRAGANA}]"
                       f"|[{_UWORD}]+")

# CJKBigramFilter role (solr-8.4.0/lucene/analysis/common/src/java/org/
# apache/lucene/analysis/cjk/CJKBigramFilter.java, the CJKAnalyzer
# chain): consecutive single-ideograph tokens (the per-char HAN/HIRAGANA
# classes the tokenizer above emits) combine into OVERLAPPING bigrams;
# the last char of a multi-char run is consumed by its bigram; a LONE
# ideograph stays a unigram (outputUnigrams=false keeps singles as the
# only unigrams — CJKBigramFilter.java:52-57,198-213). The filter pairs
# consecutive CJK-typed TOKENS, so "中 文" (whitespace between) bigrams
# exactly like "中文" — same as the reference, which looks only at token
# types and increments. Scope: the per-char classes only; katakana/
# hangul tokenize as runs here and stay whole (documented deviation from
# the filter's optional K/H flags).
_CJK_RANGES = [tuple(r) for r in
               ("一鿿", "㐀䶿", "豈﫿", "぀ゟ")]


def _is_cjk_char(t: str) -> bool:
    return len(t) == 1 and any(lo <= t <= hi for lo, hi in _CJK_RANGES)


def cjk_bigram_tokens(ts: list) -> list:
    out = []
    n = len(ts)
    for i, t in enumerate(ts):
        if t is None:
            out.append(None)
            continue
        if _is_cjk_char(t):
            nxt = ts[i + 1] if i + 1 < n else None
            prv = ts[i - 1] if i > 0 else None
            if nxt is not None and _is_cjk_char(nxt):
                out.append(t + nxt)
            elif not (prv is not None and _is_cjk_char(prv)):
                out.append(t)  # lone ideograph: unigram survives
            # else: consumed by the previous bigram — emit nothing
        else:
            out.append(t)
    return out


def cjk_flags_sql(toks_expr: str) -> str:
    """DuckDB: per-token CJK-single-char flags for cjk_bigram_sql
    (UTF-8 byte order == codepoint order, so single-char range compares
    match the Python tuple compares)."""
    rng = " OR ".join(f"(x >= '{lo}' AND x <= '{hi}')"
                      for lo, hi in _CJK_RANGES)
    return (f"list_transform({toks_expr}, x -> CASE WHEN "
            f"length(x) = 1 AND ({rng}) THEN 1 ELSE 0 END)")


def cjk_bigram_sql(ts0: str = "ts0", fs: str = "fs") -> str:
    """DuckDB replica of cjk_bigram_tokens, given column names holding
    the raw token list (ts0) and its cjk_flags_sql flags (fs): the same
    per-index CASE, NULLs (consumed run tails) filtered out."""
    return (
        f"list_filter(list_transform(range(1, len({ts0}) + 1), i -> "
        f"CASE "
        f"WHEN {fs}[i] = 1 AND i < len({ts0}) AND {fs}[i+1] = 1 "
        f"THEN {ts0}[i] || {ts0}[i+1] "
        f"WHEN {fs}[i] = 1 AND (i = 1 OR {fs}[i-1] = 0) "
        f"AND (i = len({ts0}) OR {fs}[i+1] = 0) THEN {ts0}[i] "
        f"WHEN {fs}[i] = 0 THEN {ts0}[i] "
        f"ELSE NULL END), t -> t IS NOT NULL)")


# ---------------------------------------------------------------------------
# ASCIIFoldingFilter role (solr-8.4.0/lucene/analysis/common/src/java/org/
# apache/lucene/analysis/miscellaneous/ASCIIFoldingFilter.java): fold
# accented/decorated Latin characters to their ASCII base.  The chain folds
# AFTER lowercasing (tokens are already lowercase), so only lowercase forms
# need mapping.  Scope: Latin-1 Supplement + Latin Extended-A — the ranges
# the tokenizer's _UWORD class admits; the filter's exotic blocks
# (fullwidth forms, dingbats) are outside the token charset here.  The SAME
# tables drive the DuckDB oracle (translate() for 1:1 + replace() chain for
# the multi-char expansions), so fold behavior is bit-reproducible.
_FOLD_1TO1 = {
    "àáâãäåāăą": "a", "çćĉċč": "c", "ďđð": "d", "èéêëēĕėęě": "e",
    "ĝğġģ": "g", "ĥħ": "h", "ìíîïĩīĭįı": "i", "ĵ": "j", "ķ": "k",
    "ĺļľŀł": "l", "ñńņňŉŋ": "n", "òóôõöøōŏő": "o", "ŕŗř": "r",
    "śŝşš": "s", "ţťŧ": "t", "ùúûüũūŭůűų": "u", "ŵ": "w", "ýÿŷ": "y",
    "źżž": "z",
}
_FOLD_MULTI = {"ß": "ss", "æ": "ae", "œ": "oe", "þ": "th", "ĳ": "ij"}
FOLD_FROM = "".join(src for srcs in _FOLD_1TO1 for src in srcs)
FOLD_TO = "".join(dst for srcs, dst in _FOLD_1TO1.items() for _ in srcs)
_FOLD_TABLE = {ord(c): dst for srcs, dst in _FOLD_1TO1.items() for c in srcs}
_FOLD_TABLE.update({ord(c): dst for c, dst in _FOLD_MULTI.items()})


def fold_ascii(token: str) -> str:
    """Fold one (already lowercased) token to ASCII per the tables above."""
    return token if token.isascii() else token.translate(_FOLD_TABLE)


def fold_sql(expr: str) -> str:
    """DuckDB expression applying the SAME fold to a string expression —
    used by oracle SQL so engine and oracle share one definition."""
    for c, dst in _FOLD_MULTI.items():
        expr = f"replace({expr}, '{c}', '{dst}')"
    return f"translate({expr}, '{FOLD_FROM}', '{FOLD_TO}')"


@dataclass(frozen=True)
class AnalyzerConfig:
    token_regex: str = TOKEN_REGEX
    max_token_length: int = MAX_TOKEN_LENGTH
    stopwords: frozenset = field(default_factory=frozenset)  # default EMPTY
    # "porter" enables the PorterStemFilter stage (EnglishAnalyzer's
    # stemmer, solr-8.4.0/lucene/analysis/common/.../en/PorterStemFilter
    # .java) applied AFTER lowercase+stop filtering, Lucene's chain order
    stemmer: str | None = None
    # SynonymGraphFilter role (solr-8.4.0/lucene/analysis/common/src/java/
    # org/apache/lucene/analysis/synonym/SynonymGraphFilter.java):
    # canonical tuple of (lhs, (rhs, ...)) rules built by canon_synonyms().
    # lhs/rhs are POST-chain terms (after lowercase/stop/stem — place the
    # filter at the end of the chain like Lucene's usual configuration);
    # multi-word sides are space-joined. synonyms_at picks the side of the
    # classic trade: "query" expands query text into SynonymQuery groups
    # (Searcher.text_query), "index" injects rhs terms at the lhs token's
    # position (position increment 0) at build time.
    synonyms: tuple = ()
    synonyms_at: str = "query"
    # ASCIIFoldingFilter role: fold accented Latin to ASCII right after
    # lowercasing (before stop/stem), per the _FOLD_* tables above.
    ascii_fold: bool = False
    # ShingleFilter role (solr-8.4.0/lucene/analysis/common/.../shingle/
    # ShingleFilter.java): token n-grams of the listed sizes emitted IN
    # ADDITION to unigrams (outputUnigrams=true), space-joined, at the
    # FIRST member token's position (posIncr-0 analogue — dl/norms count
    # only unigrams, matching discountOverlaps).  A shingle spans n
    # CONSECUTIVE positions; stopword holes break shingles (no filler
    # tokens — documented divergence from the filler-token behavior).
    # Index-time expansion only (tokenize_to_flat*), like index synonyms.
    shingles: tuple = ()
    # PhoneticFilter role (lucene/analysis/phonetic with the
    # commons-codec Soundex encoder): "soundex" REPLACES each token with
    # its American Soundex code after stemming (inject=false mode; see
    # functions/phonetic.py for the algorithm + the inject deviation).
    # Query analysis runs the same chain, so "smith" matches "smyth".
    phonetic: str | None = None
    # CJKBigramFilter role (see cjk_bigram_tokens above): overlapping
    # ideograph bigrams after tokenization, before stop/stem
    cjk_bigrams: bool = False
    # DelimitedPayloadTokenFilter role (solr-8.4.0/lucene/analysis/common/
    # src/java/org/apache/lucene/analysis/payloads/
    # DelimitedPayloadTokenFilter.java with the FloatEncoder): a raw token
    # "term<delim>3.5" splits at the FIRST delimiter into the index term
    # and a float32 payload stored per position (the .pay stream role,
    # L/codecs/lucene84/Lucene84PostingsFormat.java:99-104).  Tokens
    # without the delimiter (or with a non-numeric tail) carry payload
    # 0.0.  Pair with a tokenizer whose token chars include the delimiter
    # (e.g. token_regex r"[^ ]+" — the filter's usual
    # WhitespaceTokenizer pairing); payload mode excludes stemmer/
    # synonyms/shingles (validated at build).
    payload_delim: str | None = None
    # EdgeNGramTokenFilter role (solr-8.4.0/lucene/analysis/common/src/
    # java/org/apache/lucene/analysis/ngram/EdgeNGramTokenFilter.java):
    # (min_gram, max_gram) — every token ALSO emits its prefixes of
    # length min_gram..min(max_gram, len-1) at the SAME position
    # (posIncr-0; preserveOriginal=true semantics: the full token is
    # always the primary stream token, so the len(t)-length gram is
    # skipped rather than emitted twice).  Offsets (when stored) keep the
    # SOURCE token's character span (the filter's post-4.4 behavior —
    # grams no longer narrow offsets).  dl/norms/collection stats count
    # unigrams only (discountOverlaps).  Index-time expansion only: query
    # analysis leaves the typed prefix as a literal term — the
    # search-as-you-type configuration.
    edge_ngrams: tuple = ()
    # NGramTokenFilter role (same package, NGramTokenFilter.java):
    # (min_gram, max_gram) — every token ALSO emits ALL its substrings of
    # those lengths (every start offset) at the token's position, for
    # infix matching.  The (start=0, len(t))-length gram duplicates the
    # primary token and is skipped.  Same posIncr-0 / offsets / stats
    # rules as edge_ngrams.  Both gram modes exclude shingles and
    # index-time synonyms (grams of grams are not meaningful).
    ngrams: tuple = ()


def canon_synonyms(mapping) -> tuple:
    """Canonical frozen synonym-rule form for AnalyzerConfig.synonyms:
    sorted tuple of (lhs, sorted tuple of rhs alternatives), lhs removed
    from its own rhs set. Accepts {lhs: rhs_or_iterable} or pairs."""
    items = mapping.items() if isinstance(mapping, dict) else mapping
    out = []
    for lhs, rhs in items:
        if isinstance(rhs, str):
            rhs = (rhs,)
        rhss = tuple(sorted(set(rhs) - {lhs}))
        if rhss:
            out.append((lhs, rhss))
    return tuple(sorted(out))


def unicode_analyzer(stopwords: frozenset = frozenset()) -> AnalyzerConfig:
    """AnalyzerConfig in Unicode word-char mode (see UNICODE_TOKEN_REGEX).
    Use the SAME config for build and any query-text analysis; DuckDB
    oracles reproduce it with regexp_extract_all(lower(text), pattern)."""
    return AnalyzerConfig(token_regex=UNICODE_TOKEN_REGEX,
                          stopwords=stopwords)


def _split_oversize(tokens: list[str], max_len: int) -> list[str]:
    # StandardTokenizer *splits* tokens longer than maxTokenLength
    # (StandardTokenizer.java:143-162 skipped-and-split behavior).
    if not any(len(t) > max_len for t in tokens):
        return tokens
    out: list[str] = []
    for t in tokens:
        if len(t) <= max_len:
            out.append(t)
        else:
            out.extend(t[i:i + max_len] for i in range(0, len(t), max_len))
    return out


def tokenize_series(content: pd.Series, cfg: AnalyzerConfig | None = None) -> pd.Series:
    """Series[str] -> Series[list[str]] of lowercase tokens in order."""
    cfg = cfg or AnalyzerConfig()
    lowered = content.fillna("").str.lower()
    toks = lowered.str.findall(cfg.token_regex)
    if cfg.max_token_length:
        # vectorized pre-mask: only docs that can contain an oversize token
        # pay the per-token split scan (rare in practice). Runs on the SAME
        # lowercased text findall sees, so characters that only become
        # word-chars after lower() (e.g. U+212A -> 'k') can't slip past it.
        # The ASCII class is only a valid pre-mask for the default ASCII
        # tokenizer; any custom regex (e.g. the Unicode mode) gets an
        # exact per-row length check instead — same result, no false skips
        if cfg.token_regex == TOKEN_REGEX:
            might = lowered.str.contains(
                "[a-z0-9_]{%d,}" % (cfg.max_token_length + 1), regex=True)
        else:
            ml = cfg.max_token_length
            might = toks.map(lambda ts: any(len(t) > ml for t in ts))
        if might.any():
            toks = toks.where(~might, toks[might].map(
                lambda ts: _split_oversize(ts, cfg.max_token_length)))
    if cfg.cjk_bigrams:
        toks = toks.map(cjk_bigram_tokens)
    if cfg.ascii_fold:
        toks = toks.map(lambda ts: [fold_ascii(t) for t in ts])
    if cfg.stopwords:
        sw = cfg.stopwords
        # keep original positions: represent holes by filtering (term,pos)
        # downstream; here we return tokens with None markers removed later
        toks = toks.map(lambda ts: [t if t not in sw else None for t in ts])
    if cfg.stemmer == "porter":
        from .stem import stem_tokens
        memo: dict = {}  # batch-wide vocab memo: one stem per DISTINCT token
        toks = toks.map(lambda ts: stem_tokens(ts, memo))
    elif cfg.stemmer is not None:
        raise ValueError(f"unknown stemmer {cfg.stemmer!r}")
    if cfg.phonetic == "soundex":
        from .phonetic import phonetic_tokens
        pmemo: dict = {}
        toks = toks.map(lambda ts: phonetic_tokens(ts, pmemo))
    elif cfg.phonetic is not None:
        raise ValueError(f"unknown phonetic encoder {cfg.phonetic!r}")
    return toks


def _inject_index_synonyms(row_idx, pos, flat, cfg,
                           starts=None, ends=None):
    """posIncr-0 index-time synonym injection — SynonymGraphFilter's
    index-time role (solr-8.4.0/lucene/analysis/common/.../synonym/
    SynonymGraphFilter.java with posIncr-0 output tokens): every
    occurrence of a rule's lhs also emits each rhs term at the SAME
    position (position increment 0), so phrases spanning the synonym
    still match. dl is computed BEFORE injection and left unchanged —
    BM25Similarity's discountOverlaps (default true,
    solr-8.4.0/.../search/similarities/BM25Similarity.java:58-63)
    excludes posIncr-0 tokens from the norm; collection stats here count
    only first-increment tokens as well (documented divergence: Lucene's
    sumTotalTermFreq includes overlaps — a known artifact).

    Index-time rules must be single-word on both sides (the reference's
    index-time graph flattening is lossy for multi-word rules; use
    synonyms_at='query' for those). Offsets (when stored) copy the lhs
    token's character span. Returns the stream re-sorted (row, pos) so
    downstream delta encoders see ascending positions."""
    add = []
    for lhs, rhss in cfg.synonyms:
        if " " in lhs or any(" " in r for r in rhss):
            raise ValueError(
                "index-time synonyms must be single-word on both sides; "
                f"use synonyms_at='query' for rule {lhs!r}")
        idx = np.nonzero(flat == lhs)[0]
        if len(idx) == 0:
            continue
        for r in rhss:
            add.append((idx, r))
    if not add:
        return (row_idx, pos, flat, starts, ends)
    ri = [row_idx] + [row_idx[idx] for idx, _ in add]
    po = [pos] + [pos[idx] for idx, _ in add]
    fl = [flat] + [np.full(len(idx), r, dtype=object) for idx, r in add]
    row_idx = np.concatenate(ri)
    pos = np.concatenate(po)
    flat = np.concatenate(fl)
    if starts is not None:
        starts = np.concatenate(
            [starts] + [starts[idx] for idx, _ in add])
        ends = np.concatenate([ends] + [ends[idx] for idx, _ in add])
    order = np.lexsort((pos, row_idx))
    return (row_idx[order], pos[order], flat[order],
            None if starts is None else starts[order],
            None if ends is None else ends[order])


def split_payloads(flat: np.ndarray, delim: str):
    """DelimitedPayloadTokenFilter: split each token at the FIRST delim
    into (term, float32 payload); no delim or non-numeric tail -> 0.0.
    Returns (terms: object[], payloads: float32[]) aligned with `flat`."""
    if len(flat) == 0:
        return flat, np.zeros(0, dtype=np.float32)
    s = pd.Series(flat, dtype=object)
    parts = s.str.split(delim, n=1)
    terms = parts.str[0].to_numpy(dtype=object)
    pay = (pd.to_numeric(parts.str[1], errors="coerce")
           .fillna(0.0).astype(np.float32).to_numpy())
    return terms, pay


def _inject_shingles(row_idx, pos, flat, cfg, starts=None, ends=None):
    """ShingleFilter expansion over the PRIMARY token stream (before any
    posIncr-0 synonym injection, so positions are strictly increasing per
    row): for each size n in cfg.shingles, every run of n tokens at
    CONSECUTIVE positions within one row emits the space-joined shingle at
    the first token's position.  Offsets (when stored) span first token
    start .. last token end.  Returns the stream re-sorted (row, pos)."""
    sizes = [n for n in cfg.shingles if n >= 2]
    if not sizes or len(flat) == 0:
        return (row_idx, pos, flat, starts, ends)
    add_r, add_p, add_t, add_s, add_e = [], [], [], [], []
    for n in sizes:
        if len(flat) < n:
            continue
        # positions are strictly increasing within a row, so a span of n
        # tokens is position-consecutive iff pos[i+n-1] - pos[i] == n-1
        ok = (row_idx[:len(row_idx) - n + 1] == row_idx[n - 1:]) & \
             (pos[n - 1:] - pos[:len(pos) - n + 1] == n - 1)
        idxs = np.nonzero(ok)[0]
        if len(idxs) == 0:
            continue
        add_r.append(row_idx[idxs])
        add_p.append(pos[idxs])
        add_t.append(np.array([" ".join(flat[j:j + n]) for j in idxs],
                              dtype=object))
        if starts is not None:
            add_s.append(starts[idxs])
            add_e.append(ends[idxs + n - 1])
    if not add_r:
        return (row_idx, pos, flat, starts, ends)
    row_idx = np.concatenate([row_idx] + add_r)
    pos = np.concatenate([pos] + add_p)
    flat = np.concatenate([flat] + add_t)
    if starts is not None:
        starts = np.concatenate([starts] + add_s)
        ends = np.concatenate([ends] + add_e)
    order = np.lexsort((pos, row_idx))
    return (row_idx[order], pos[order], flat[order],
            None if starts is None else starts[order],
            None if ends is None else ends[order])


def _inject_grams(row_idx, pos, flat, cfg, starts=None, ends=None):
    """Edge-/full-ngram expansion over the PRIMARY token stream —
    EdgeNGramTokenFilter / NGramTokenFilter (solr-8.4.0/lucene/analysis/
    common/src/java/org/apache/lucene/analysis/ngram/): each source token
    additionally emits prefix grams (edge_ngrams) and/or every-offset
    substring grams (ngrams) of the configured lengths at the SOURCE
    token's position (posIncr 0) and, when offsets are stored, the SOURCE
    token's character span.  Grams equal to the whole token are skipped —
    the primary stream already carries it (preserveOriginal semantics
    without a duplicate posting).  Vectorized per (length, start) pair:
    the loop count is bounded by gram-length range x observed max token
    length, each iteration a masked pandas slice."""
    if cfg.shingles or (cfg.synonyms and cfg.synonyms_at == "index"):
        raise ValueError(
            "edge_ngrams/ngrams cannot combine with shingles or "
            "index-time synonyms")
    if len(flat) == 0:
        return (row_idx, pos, flat, starts, ends)
    s = pd.Series(flat, dtype=object)
    lens = s.str.len().to_numpy(dtype=np.int64)
    max_len = int(lens.max())
    add_i, add_t = [], []
    if cfg.edge_ngrams:
        lo, hi = cfg.edge_ngrams
        for g in range(max(1, lo), min(hi, max_len - 1) + 1):
            idx = np.nonzero(lens > g)[0]  # == g would duplicate primary
            if len(idx):
                add_i.append(idx)
                add_t.append(s.iloc[idx].str[:g].to_numpy(dtype=object))
    if cfg.ngrams:
        lo, hi = cfg.ngrams
        for g in range(max(1, lo), min(hi, max_len) + 1):
            for st in range(0, max_len - g + 1):
                idx = np.nonzero(lens >= st + g)[0]
                if st == 0:  # skip the whole-token gram (primary dup)
                    idx = idx[lens[idx] > g]
                if len(idx):
                    add_i.append(idx)
                    add_t.append(s.iloc[idx].str[st:st + g]
                                 .to_numpy(dtype=object))
    if not add_i:
        return (row_idx, pos, flat, starts, ends)
    src = np.concatenate(add_i)
    row_idx = np.concatenate([row_idx, row_idx[src]])
    pos = np.concatenate([pos, pos[src]])
    flat = np.concatenate([flat] + add_t)
    if starts is not None:
        starts = np.concatenate([starts, starts[src]])
        ends = np.concatenate([ends, ends[src]])
    order = np.lexsort((pos, row_idx))
    return (row_idx[order], pos[order], flat[order],
            None if starts is None else starts[order],
            None if ends is None else ends[order])


def tokenize_to_flat(content: pd.Series, cfg: AnalyzerConfig | None = None):
    """Vectorized flatten: returns (row_idx:int64[], pos:int32[], term:object[])
    where pos is the token's position within its document (stopword holes
    preserved) and row_idx indexes into ``content``'s positional order.
    Also returns dl:int64[] per row = number of non-stopword tokens
    (FieldInvertState.length - numOverlap analogue; we emit no 0-increment
    tokens, so numOverlap == 0)."""
    cfg = cfg or AnalyzerConfig()
    toks = tokenize_series(content, cfg)
    counts = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    row_idx = np.repeat(np.arange(len(toks), dtype=np.int64), counts)
    if len(toks):
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks.to_numpy()]) \
            if counts.sum() else np.empty(0, dtype=object)
    else:
        flat = np.empty(0, dtype=object)
    # position within doc = running index per row
    pos = (np.arange(len(flat), dtype=np.int64)
           - np.repeat(np.concatenate(([0], np.cumsum(counts)[:-1])), counts)).astype(np.int32)
    if cfg.stopwords:
        keep = np.array([t is not None for t in flat], dtype=bool)
        row_idx, pos, flat = row_idx[keep], pos[keep], flat[keep]
    dl = np.bincount(row_idx, minlength=len(toks)).astype(np.int64)
    if cfg.shingles:
        row_idx, pos, flat, _, _ = _inject_shingles(row_idx, pos, flat, cfg)
    if cfg.edge_ngrams or cfg.ngrams:
        row_idx, pos, flat, _, _ = _inject_grams(row_idx, pos, flat, cfg)
    if cfg.synonyms and cfg.synonyms_at == "index":
        row_idx, pos, flat, _, _ = _inject_index_synonyms(
            row_idx, pos, flat, cfg)
    return row_idx, pos, flat, dl


def tokenize_to_flat_with_offsets(content: pd.Series,
                                  cfg: AnalyzerConfig | None = None):
    """tokenize_to_flat plus per-token CHARACTER offsets (start, end) into
    the original text — the IndexOptions ..._AND_OFFSETS analogue
    (solr-8.4.0/.../index/IndexOptions.java:25-53,
    StandardTokenizer's offset attributes). The ORIGINAL text is tokenized
    with a case-insensitive regex and each token is lowercased afterwards
    — Lucene's actual order (tokenizer, THEN LowerCaseFilter) — so offsets
    index the original exactly even when lower() is not length-preserving
    (e.g. U+0130 lowers to two chars; the lowered-first vectorized path
    would shift every later offset). For ASCII text the tokens are
    identical to tokenize_to_flat's; exotic one-char-to-many case foldings
    may tokenize slightly differently (parity asserted on ASCII in tests).
    Uses re.finditer per doc — a build-time-only cost paid when an index
    opts into stored offsets; the offset-less default path stays fully
    vectorized."""
    import re
    cfg = cfg or AnalyzerConfig()
    rx = re.compile(cfg.token_regex, re.IGNORECASE)
    sw = cfg.stopwords
    ml = cfg.max_token_length
    stem_memo = {} if cfg.stemmer == "porter" else None
    rows_i: list = []
    rows_p: list = []
    rows_t: list = []
    rows_s: list = []
    rows_e: list = []
    dl = np.zeros(len(content), dtype=np.int64)
    for i, txt in enumerate(content.fillna("").to_numpy()):
        pos = 0
        kept = 0
        for m in rx.finditer(txt):
            pieces = [(m.group(0).lower(), m.start(), m.end())]
            if ml and len(pieces[0][0]) > ml:
                t, a, _ = pieces[0]
                # split boundaries follow the LOWERED token text (same
                # pieces as the vectorized path); offsets approximate by
                # the same indices into the original span, clamped
                pieces = [(t[j:j + ml], min(a + j, m.end()),
                           min(a + min(j + ml, len(t)), m.end()))
                          for j in range(0, len(t), ml)]
            for t, a, b in pieces:
                if cfg.ascii_fold:
                    t = fold_ascii(t)
                if sw and t in sw:
                    pos += 1  # stopword hole keeps the position increment
                    continue
                if stem_memo is not None:
                    got = stem_memo.get(t)
                    if got is None:
                        from .stem import porter_stem
                        got = stem_memo[t] = porter_stem(t)
                    t = got  # stemmed term keeps the ORIGINAL char span
                rows_i.append(i)
                rows_p.append(pos)
                rows_t.append(t)
                rows_s.append(a)
                rows_e.append(b)
                pos += 1
                kept += 1
        dl[i] = kept
    row_idx = np.asarray(rows_i, dtype=np.int64)
    pos = np.asarray(rows_p, dtype=np.int32)
    flat = np.asarray(rows_t, dtype=object)
    starts = np.asarray(rows_s, dtype=np.int64)
    ends = np.asarray(rows_e, dtype=np.int64)
    if cfg.shingles:
        row_idx, pos, flat, starts, ends = _inject_shingles(
            row_idx, pos, flat, cfg, starts, ends)
    if cfg.edge_ngrams or cfg.ngrams:
        row_idx, pos, flat, starts, ends = _inject_grams(
            row_idx, pos, flat, cfg, starts, ends)
    if cfg.synonyms and cfg.synonyms_at == "index":
        row_idx, pos, flat, starts, ends = _inject_index_synonyms(
            row_idx, pos, flat, cfg, starts, ends)
    return row_idx, pos, flat, dl, starts, ends

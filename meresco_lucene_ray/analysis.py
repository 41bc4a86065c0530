"""Text analysis: the frozen tokenizer spec shared by index, query and SQL oracle.

Reference behavior being re-expressed (NOT ported):
``MerescoStandardAnalyzer`` — ClassicTokenizer → ClassicFilter →
ASCIIFoldingFilter → LowerCaseFilter
(/root/reference/src/org/meresco/lucene/analysis/MerescoStandardAnalyzer.java:53-96).
The reference guarantees index-side and query-side tokenization agree; we keep
that guarantee by freezing ONE spec used everywhere, including the DuckDB
oracle SQL:

    tokens(text) = regexp findall of  [a-z0-9_]+  over lower(text)

(`_` is a letter for source code; accent folding is an optional extra pass via
``fold_ascii`` — off by default so the Python and SQL sides stay bit-identical.)

Everything here is pure Python/numpy — no Ray.  The hot path entry point is
``tokenize_batch`` which is called inside ``map_batches`` stages.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter
from collections.abc import Iterable, Sequence

import numpy as np

TOKEN_PATTERN = r"[a-z0-9_]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# The SAME tokenizer, as a DuckDB SQL expression over a column reference.
# Keep in lockstep with TOKEN_PATTERN — the oracle gate depends on it.
SQL_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9_]+')"

# bytes whose codepoint is in [A-Za-z0-9_] — the frozen token class.  Any
# UTF-8 multibyte character has every byte ≥ 0x80, so byte-level
# classification splits EXACTLY like the regex's codepoint semantics.
_TOKEN_BYTE = np.zeros(256, dtype=bool)
_TOKEN_BYTE[
    np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_",
        dtype=np.uint8,
    )
] = True

# chars whose Unicode LOWERCASE maps into [a-z0-9_] without being
# [A-Za-z0-9_] themselves: İ (U+0130 → "i" + U+0307) and K (U+212A → "k") —
# the only inputs where scan-original-case-then-lower-the-dictionary
# diverges from lower-first tokenization.  Exhaustively verified over every
# Unicode codepoint by tests/test_tokenize_paths.py.
UNSAFE_LOWER_RE = "[\u0130\u212a]"  # İ, K (Kelvin sign) — escaped to survive editors


def ascii_token_stream(col):
    """Tokenize a string column by byte-table scan — the safe-path
    replacement for ``split_pattern_regex`` (~2× on source-text shapes):
    token = maximal run of ``_TOKEN_BYTE`` bytes within one doc.

    Returns ``(values StringArray, token_doc int32[])`` where ``values`` are
    the (original-case) tokens in doc order and ``token_doc[i]`` the doc of
    token i.  The compact values buffer is just ``b[ok]`` — token bytes in
    buffer order ARE the concatenation of all tokens, so no gather-index
    arithmetic and no empty tokens to drop.  Nulls must be pre-filled;
    callers must gate on ``UNSAFE_LOWER_RE`` before lowering the dictionary
    (see TokenizeStage._tokens_arrow / arrow_tokens)."""
    import pyarrow as pa

    if pa.types.is_large_string(col.type):
        wid, stype = np.int64, pa.large_string()
    else:
        wid, stype = np.int32, pa.string()
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=wid, count=len(col) + 1 + col.offset)[
        col.offset :
    ]
    lo, hi = int(offs[0]), int(offs[-1])
    b = (
        np.frombuffer(bufs[2], dtype=np.uint8)[lo:hi]
        if bufs[2] is not None  # all-empty arrays can carry a null data buffer
        else np.empty(0, dtype=np.uint8)
    )
    ok = _TOKEN_BYTE[b]
    nb = ok.size
    doc_pos = offs[1:-1].astype(np.int64) - lo  # interior doc boundaries
    prev = np.empty_like(ok)
    nxt = np.empty_like(ok)
    if nb:
        prev[0] = False
        prev[1:] = ok[:-1]
        nxt[-1] = False
        nxt[:-1] = ok[1:]
    # a token never spans docs: force a break on both sides of a boundary
    dp = doc_pos[doc_pos < nb]
    prev[dp] = False
    dpm = doc_pos[doc_pos > 0] - 1
    nxt[dpm[dpm < nb]] = False
    starts = np.flatnonzero(ok & ~prev)
    L = (np.flatnonzero(ok & ~nxt) + 1) - starts
    token_doc = (np.searchsorted(offs, starts + lo, side="right") - 1).astype(
        np.int32
    )
    out_off = np.concatenate(([0], np.cumsum(L)))
    values = pa.Array.from_buffers(
        stype,
        starts.size,
        [
            None,
            pa.py_buffer(out_off.astype(wid, copy=False)),
            pa.py_buffer(b[ok]),
        ],
    )
    return values, token_doc


def fold_ascii(text: str) -> str:
    """ASCII-fold accents (NFKD strip of combining marks), like Lucene's
    ASCIIFoldingFilter in spirit (not bug-for-bug)."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )


def tokenize(text: str | None) -> list[str]:
    """Tokenize one string per the frozen spec."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_batch(texts: Sequence[str | None]) -> list[list[str]]:
    """Tokenize a column of strings (one compiled-regex pass per row)."""
    findall = TOKEN_RE.findall
    return [findall(t.lower()) if t else [] for t in texts]


def lowered_token_codes(col, _force: str | None = None):
    """Safe-path token stream shared by ``arrow_tokens`` and the index
    build's ``TokenizeStage._tokens_arrow`` (the ONE copy of the gate and
    the dictionary-lower/remap logic): byte-table scan of the ORIGINAL text,
    then lowercase only the token DICTIONARY, merging case collisions.

    Returns ``(codes int32, doc_idx int32, dictionary StringArray)``, or
    ``None`` when the ``UNSAFE_LOWER_RE`` gate demands lower-FIRST
    tokenization (İ/K — the only codepoints where scan-then-lower
    diverges).  ``col`` must be a combined, null-filled StringArray.
    ``_force`` pins a path for equivalence tests ("safe" / "unsafe")."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if _force is not None:  # test hook: pin a path to verify equivalence
        safe = _force == "safe"
    else:
        safe = bool(pc.all(pc.string_is_ascii(col), min_count=0).as_py())
        if not safe:
            safe = not bool(
                pc.any(
                    pc.match_substring_regex(col, UNSAFE_LOWER_RE), min_count=0
                ).as_py()
            )
    if not safe:
        return None
    values, doc_idx = ascii_token_stream(col)
    enc0 = pc.dictionary_encode(values)
    if isinstance(enc0, pa.ChunkedArray):
        enc0 = enc0.combine_chunks()
    enc1 = pc.dictionary_encode(pc.utf8_lower(enc0.dictionary))
    remap = enc1.indices.to_numpy(zero_copy_only=False)
    codes = remap[enc0.indices.to_numpy(zero_copy_only=False)]
    return codes, doc_idx, enc1.dictionary


def arrow_tokens(col):
    """The frozen tokenizer spec evaluated entirely in Arrow C kernels —
    equivalent to ``tokenize_batch`` but with zero Python string objects.

    Returns ``(codes int32[], doc_idx int32[], dictionary StringArray,
    dl int64[])`` where ``dictionary[codes[i]]`` is the i-th token of the
    doc-contiguous token stream, ``doc_idx[i]`` its document, and ``dl`` the
    per-doc token counts.  Used by the dedup/textstats hot paths (the index
    build keeps its own fused copy in ``index/build.py``).

    Safe path (ASCII, or no İ/K — see ``UNSAFE_LOWER_RE``): byte-table scan
    of the ORIGINAL text + lowercase only the token dictionary, merging case
    collisions — ~2× the RE2 split and no full-corpus lowered copy.  The
    dictionary keeps first-appearance order either way: lowering preserves
    dict0's order, and re-encoding it yields each lowered token at the
    position of its first original-case appearance — exactly the lower-first
    dictionary's order."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    r = lowered_token_codes(col)
    if r is not None:
        codes, doc_idx, dictionary = r
        dl = np.bincount(doc_idx, minlength=len(col)).astype(np.int64)
        return codes, doc_idx, dictionary, dl
    lower = pc.utf8_lower(col)
    lists = pc.split_pattern_regex(lower, pattern="[^a-z0-9_]+")
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    values = lists.values
    n_per_doc = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(lists), dtype=np.int32), n_per_doc)
    nonempty = pc.not_equal(pc.utf8_length(values), 0).to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(values.filter(pa.array(nonempty)))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    doc_idx = doc_idx[nonempty]
    dl = np.bincount(doc_idx, minlength=len(lists)).astype(np.int64)
    return codes, doc_idx, enc.dictionary, dl


def tokenize_whitespace(text: str | None) -> list[str]:
    """WhitespaceAnalyzer option (LuceneSettings.java:193-208): split on
    whitespace only, no lowercasing/folding."""
    return text.split() if text else []


_DUTCH_V = frozenset("aeiouyè")
_DUTCH_ACCENTS = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _dutch_undouble(word: str) -> str:
    return word[:-1] if word.endswith(("kk", "dd", "tt")) else word


def _dutch_regions(word: str) -> tuple[int, int]:
    def after_vc(begin: int) -> int:
        for i in range(begin, len(word) - 1):
            if word[i] in _DUTCH_V and word[i + 1] not in _DUTCH_V:
                return i + 2
        return len(word)

    r1 = max(after_vc(0), 3)  # ≥3 letters before R1, per the algorithm
    return r1, after_vc(r1)


def dutch_stem(word: str) -> str:
    """Snowball Dutch stemmer (the published algorithm the reference applies
    via Lucene's SnowballFilter — MerescoDutchStemmingAnalyzer.java:49-66):
    accent fold, y/i marking, R1/R2 suffix steps with undoubling."""
    word = word.translate(_DUTCH_ACCENTS)
    if len(word) < 3:
        return word
    # mark initial y, y after vowel, i between vowels as consonants (Y/I)
    chars = list(word)
    for i, c in enumerate(word):
        if c == "y" and (i == 0 or word[i - 1] in _DUTCH_V):
            chars[i] = "Y"
        elif (
            c == "i"
            and 0 < i < len(word) - 1
            and word[i - 1] in _DUTCH_V
            and word[i + 1] in _DUTCH_V
        ):
            chars[i] = "I"
    word = "".join(chars)
    r1, r2 = _dutch_regions(word)

    def in_r1(stem_len: int) -> bool:
        return stem_len >= r1

    def in_r2(stem_len: int) -> bool:
        return stem_len >= r2

    # ---- step 1: heden / en,ene / s,se (longest match)
    if word.endswith("heden"):
        if in_r1(len(word) - 5):
            word = word[:-5] + "heid"
    else:
        for suf in ("ene", "en"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if (
                    in_r1(len(stem))
                    and stem
                    and stem[-1] not in _DUTCH_V
                    and not stem.endswith("gem")
                ):
                    word = _dutch_undouble(stem)
                break
        else:
            for suf in ("se", "s"):
                if word.endswith(suf):
                    stem = word[: -len(suf)]
                    if in_r1(len(stem)) and stem and stem[-1] not in _DUTCH_V and stem[-1] != "j":
                        word = stem
                    break
    # ---- step 2: -e
    e_removed = False
    if word.endswith("e"):
        stem = word[:-1]
        if in_r1(len(stem)) and stem and stem[-1] not in _DUTCH_V:
            word = _dutch_undouble(stem)
            e_removed = True
    # ---- step 3a: -heid (then a preceding -en as in step 1)
    if word.endswith("heid") and in_r2(len(word) - 4) and (len(word) < 5 or word[-5] != "c"):
        word = word[:-4]
        if word.endswith("en"):
            stem = word[:-2]
            if (
                in_r1(len(stem))
                and stem
                and stem[-1] not in _DUTCH_V
                and not stem.endswith("gem")
            ):
                word = _dutch_undouble(stem)
    # ---- step 3b: d-suffixes (longest match)
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not word.endswith(suf):
            continue
        stem = word[: -len(suf)]
        if suf == "lijk":
            if in_r2(len(stem)):
                word = stem
                if word.endswith("e"):  # repeat step 2
                    s2 = word[:-1]
                    if in_r1(len(s2)) and s2 and s2[-1] not in _DUTCH_V:
                        word = _dutch_undouble(s2)
        elif suf == "baar":
            if in_r2(len(stem)):
                word = stem
        elif suf in ("end", "ing"):
            if in_r2(len(stem)):
                word = stem
                if word.endswith("ig") and in_r2(len(word) - 2) and (
                    len(word) < 3 or word[-3] != "e"
                ):
                    word = word[:-2]
                else:
                    word = _dutch_undouble(word)
        elif suf == "bar":
            if in_r2(len(stem)) and e_removed:
                word = stem
        elif suf == "ig":
            if in_r2(len(stem)) and (not stem or not stem.endswith("e")):
                word = stem
        break
    # ---- step 4: undouble vowel (c V V c2, c2 ≠ I, V ∈ a/e/o/u)
    if len(word) >= 4:
        c1, v1, v2, c2 = word[-4], word[-3], word[-2], word[-1]
        if (
            c1 not in _DUTCH_V
            and c2 not in _DUTCH_V
            and c2 != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            word = word[:-2] + word[-1]
    return word.replace("Y", "y").replace("I", "i")


# ---- ClassicTokenizer grammar (Lucene ClassicTokenizerImpl.jflex) ----------
# L = letter, _AN = letter|digit run (underscore is a NUM separator, not part
# of ALPHANUM), _D = alphanum containing a digit, _P = NUM separators.
_L = r"[^\W\d_]"
_AN = r"[^\W_]+"
_D = r"[^\W_]*\d[^\W_]*"
_P = r"[-_/.,]"
# rule order = the jflex listing order (tie-break); longest match wins
_CLASSIC_RULES: list[tuple[str, re.Pattern]] = [
    ("ALPHANUM", re.compile(_AN)),
    ("APOSTROPHE", re.compile(rf"{_L}+(?:'{_L}+)+")),
    ("ACRONYM", re.compile(rf"{_L}\.(?:{_L}\.)+")),
    ("COMPANY", re.compile(rf"{_L}+[&@]{_L}+")),
    ("EMAIL", re.compile(rf"{_AN}(?:[-._]{_AN})*@{_AN}(?:[-.]{_AN})+")),
    ("HOST", re.compile(rf"{_AN}(?:\.{_AN})+")),
    # NUM: P-separated segments where every other segment contains a digit
    ("NUM", re.compile(
        rf"(?:{_AN}(?:{_P}{_D}{_P}{_AN})*{_P}{_D}(?:{_P}{_AN})?"
        rf"|{_D}(?:{_P}{_AN}{_P}{_D})*{_P}{_AN}(?:{_P}{_D})?)"
    )),
]


def classic_scan(text: str):
    """Longest-match scan yielding ``(token_type, token)`` pairs — the
    ClassicTokenizer state machine re-expressed as prioritized regexes."""
    pos, n = 0, len(text)
    while pos < n:
        best_key, best = None, None
        for prio, (ttype, rx) in enumerate(_CLASSIC_RULES):
            m = rx.match(text, pos)
            if m and m.end() > pos:
                key = (m.end() - pos, -prio)
                if best_key is None or key > best_key:
                    best_key, best = key, (ttype, m.group(0))
        if best is None:
            pos += 1
            continue
        yield best
        pos += best_key[0]


def tokenize_classic(text: str | None) -> list[str]:
    """ClassicTokenizer → ClassicFilter → ASCIIFoldingFilter → LowerCase —
    the full MerescoStandardAnalyzer chain (MerescoStandardAnalyzer.java:
    53-70).  Token types follow the Classic grammar: product numbers
    (``oc-0123``, ``p.435-444``) and emails/hosts/AT&T-style names stay one
    token; the filter strips possessive ``'s`` from APOSTROPHE tokens and
    dots from ACRONYM tokens (I.B.M. → ibm, John's → john).  Opt-in via
    ``IndexConfig(analyzer='classic')`` — the frozen default spec (shared
    with the SQL oracle) is untouched."""
    if not text:
        return []
    out: list[str] = []
    for ttype, tok in classic_scan(text):
        if ttype == "APOSTROPHE" and tok.lower().endswith("'s"):
            tok = tok[:-2]  # ClassicFilter possessive strip
        elif ttype == "ACRONYM":
            tok = tok.replace(".", "")  # ClassicFilter acronym-dot strip
        tok = fold_ascii(tok).lower()
        if tok:
            out.append(tok)
    return out


def make_tokenizer(
    kind: str = "standard",
    ascii_folding: bool = False,
    stem: str | None = None,
):
    """Tokenizer factory — the analyzer-strategy enum (M1/M2/M3).

    ``stem`` emits BOTH the original and the stemmed token when they differ
    (KeywordRepeatFilter → stemmer → RemoveDuplicatesTokenFilter semantics,
    MerescoDutchStemmingAnalyzer.java:49-66)."""
    base = {"standard": tokenize, "whitespace": tokenize_whitespace, "classic": tokenize_classic}[
        kind
    ]
    stemmer = dutch_stem if stem == "dutch" else None

    def one(text: str | None) -> list[str]:
        if ascii_folding and text:
            text = fold_ascii(text)
        toks = base(text)
        if stemmer is None:
            return toks
        out: list[str] = []
        for t in toks:
            st = stemmer(t)
            out.append(t)
            if st != t:
                out.append(st)
        return out

    def many(texts: Sequence[str | None]) -> list[list[str]]:
        return [one(t) for t in texts]

    return many


class DelegatingAnalyzer:
    """Analyzer wrapper adding a per-field position-increment gap
    (src/org/meresco/lucene/analysis/DelegatingAnalyzer.java:33-58,
    ``delegatinganalyzertest.py``).

    The delegate is any many-texts tokenizer (``make_tokenizer`` form).
    ``token_positions`` applies the Lucene gap semantic to a MULTI-VALUED
    field: token positions restart ``gap`` past the previous value's last
    position, so phrase queries never span value boundaries."""

    def __init__(self, delegate, position_increment_gap: int = 10):
        self._delegate = delegate
        self._gap = position_increment_gap

    def get_wrapped_analyzer(self, fieldname: str):
        return self._delegate

    def get_position_increment_gap(self, fieldname: str) -> int:
        return self._gap

    def __call__(self, texts: Sequence[str | None]) -> list[list[str]]:
        return self._delegate(texts)

    def token_positions(self, values: Sequence[str | None]) -> dict[str, list[int]]:
        pos: dict[str, list[int]] = {}
        base = 0
        for toks in self._delegate(values):
            for i, t in enumerate(toks):
                pos.setdefault(t, []).append(base + i)
            base += len(toks) + self._gap
        return pos


def term_freqs(tokens: Iterable[str]) -> Counter:
    return Counter(tokens)


def token_positions(tokens: Sequence[str]) -> dict[str, list[int]]:
    """term -> sorted token positions (for phrase queries)."""
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        pos.setdefault(t, []).append(i)
    return pos


def word_shingles(tokens: Sequence[str], min_n: int = 2, max_n: int = 3) -> list[str]:
    """Word n-gram shingles, mirroring the suggestion ShingleAnalyzer semantics
    (/root/reference/src/org/meresco/lucene/suggestion/ShingleAnalyzer.java)."""
    out: list[str] = []
    L = len(tokens)
    for n in range(min_n, max_n + 1):
        for i in range(L - n + 1):
            out.append(" ".join(tokens[i : i + n]))
    return out


def char_ngrams(value: str, n: int, boundaries: bool = True) -> list[str]:
    """Character n-grams with ``$word$`` boundary markers, mirroring the
    autocomplete NGramAnalyzer + AddWordBoundaryFilter
    (/root/reference/src/org/meresco/lucene/suggestion/NGramAnalyzer.java)."""
    toks = tokenize(value)
    out: list[str] = []
    for w in toks:
        s = f"${w}$" if boundaries else w
        out.extend(s[i : i + n] for i in range(len(s) - n + 1))
    return out

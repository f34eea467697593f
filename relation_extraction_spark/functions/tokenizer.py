"""Deterministic, vocab-free tokenizer with exact char-offset alignment.

The reference tokenizes with a BERT WordPiece tokenizer wrapped so that six
whitespace/quote variants survive as sentinel tokens (reference
utils/base.py:66-111), then *re-derives* token→char offsets after the fact
with a fragile scanning alignment (reference data/lic_2020.py:193-262 —
the trickiest code in that repo, with [UNK] many-to-one and one-to-many
wordpiece cases).

We keep the same observable invariants but compute offsets *at tokenize
time*, which removes the entire [UNK]/re-derivation failure class:

* sentinel semantics preserved (same trigger conditions, same 6 classes):
  - ASCII space strictly between two CJK chars at 1 < i < len-1  → one token
  - NBSP '\\xa0', ideographic space '\\u3000', '“', '”'           → one token
  - double ASCII space '  '                                       → one token
* CJK chars are single-char tokens (BERT tokenize_chinese_chars behavior);
* ASCII alnum runs are one lowercased token (we are vocab-free: no subword
  splits, hence no [UNK] — every token has an exact char span);
* all other non-space chars are single-char tokens;
* other whitespace separates tokens and is carried by no token.

Byte-identity invariant: ``text[starts[i] : ends[i]+1]`` is exactly the
surface form the token covers, for every token — so span→string slicing is
lossless, matching the reference's requirement that the decoded entity string
equals the text slice (reference data/lic_2020.py:265-278).
"""

from __future__ import annotations

# characters treated as "separator" hand features (reference data/lic_2020.py:611-619)
SPLIT_CHARS = frozenset(
    "，《》、：（）“”-.·:—,/()…；【】~=#[]「」>%－\"&!～@★_*+<?’‘．━|＞`☆;●―'『』═／•。"
    "°・〉〈◆\\▼→^℃▲┈×↓①◎﹏＜〔〕○１②Ⅱ′◇∶─–┅♥！$〓■┄←｜③２０"
) | {" ", "\xa0", "　"}

SENTINEL_SPACE_CJK = "[unused1]"
SENTINEL_NBSP = "[unused2]"
SENTINEL_IDEO_SPACE = "[unused3]"
SENTINEL_LQUOTE = "[unused4]"
SENTINEL_RQUOTE = "[unused5]"
SENTINEL_DBL_SPACE = "[unused6]"


def is_chinese(ch: str) -> bool:
    """CJK range test (reference utils/kg.py:588-593)."""
    return "一" <= ch <= "龥"


def have_chinese(s: str) -> bool:
    return any(is_chinese(ch) for ch in s)


def _is_ascii_alnum(ch: str) -> bool:
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z") or ("0" <= ch <= "9")


import re

# Chars needing per-occurrence classification: ASCII alnum runs (one token),
# the four fixed sentinel chars, the double-space sentinel, and whitespace.
# \xa0 and　(U+3000) MUST precede \s (which matches both in unicode mode);
# "  " must precede the bare \s so the double-space pair wins, mirroring the
# per-char loop's rule order. Everything the pattern does NOT match is an
# "ordinary" char (CJK, CJK/ASCII punctuation, …): exactly one single-char
# token per char, so whole runs between special matches are emitted in bulk
# with C-level list.extend (round-8 kernel measurement: the per-match Python
# branch work dominated on CJK text where ~90% of chars are ordinary).
_SPECIAL_RX = re.compile(r"[A-Za-z0-9]+|\xa0|　|“|”|  |\s")
_FIXED_SENTINEL = {"\xa0": SENTINEL_NBSP, "　": SENTINEL_IDEO_SPACE,
                   "“": SENTINEL_LQUOTE, "”": SENTINEL_RQUOTE}


def tokenize_with_offsets(
    text: str, max_tokens: int | None = None
) -> tuple[list[str], list[int], list[int]]:
    """Return (tokens, char_starts, char_ends_inclusive).

    Regex-scan fast path; semantics identical to the explicit per-char loop
    (kept below as ``_tokenize_loop`` and differential-tested against this)."""
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    n = len(text)
    t_app, s_app, e_app = tokens.append, starts.append, ends.append
    fixed = _FIXED_SENTINEL
    pos = 0
    for m in _SPECIAL_RX.finditer(text):
        i, end = m.span()
        if i > pos:
            # ordinary run: one single-char token per char. Bulk-extend only
            # when lower() is the identity on the whole run — a cased char
            # (Greek Σ, Cyrillic, accented Latin) falls back to the per-char
            # form because str.lower is context-sensitive (final sigma) while
            # the loop form lowercases each char in isolation.
            seg = text[pos:i]
            if seg.lower() == seg:
                tokens.extend(seg)
                rng = range(pos, i)
                starts.extend(rng)
                ends.extend(rng)
            else:
                for off in range(i - pos):
                    t_app(seg[off].lower())
                    s_app(pos + off)
                    e_app(pos + off)
        pos = end
        first = text[i]
        if first == " ":
            if end - i == 2:
                tok = SENTINEL_DBL_SPACE
            elif 1 < i < n - 1 and is_chinese(text[i - 1]) and is_chinese(text[i + 1]):
                tok = SENTINEL_SPACE_CJK
            else:
                continue
        elif ("a" <= first <= "z") or ("0" <= first <= "9") or ("A" <= first <= "Z"):
            tok = m.group().lower()
        elif first in fixed:
            tok = fixed[first]
        else:  # other whitespace: separates tokens, carried by none
            continue
        t_app(tok)
        s_app(i)
        e_app(end - 1)
    if pos < n:
        seg = text[pos:n]
        if seg.lower() == seg:
            tokens.extend(seg)
            rng = range(pos, n)
            starts.extend(rng)
            ends.extend(rng)
        else:
            for off in range(n - pos):
                t_app(seg[off].lower())
                s_app(pos + off)
                e_app(pos + off)
    if max_tokens is not None and len(tokens) > max_tokens:
        tokens = tokens[:max_tokens]
        starts = starts[:max_tokens]
        ends = ends[:max_tokens]
    return tokens, starts, ends


def _tokenize_loop(
    text: str, max_tokens: int | None = None
) -> tuple[list[str], list[int], list[int]]:
    """Per-char reference form of the tokenizer (differential-test oracle)."""
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    n = len(text)
    i = 0
    run_start = -1  # start of an in-progress ASCII alnum run

    def flush_run(end_excl: int) -> None:
        nonlocal run_start
        if run_start >= 0:
            tokens.append(text[run_start:end_excl].lower())
            starts.append(run_start)
            ends.append(end_excl - 1)
            run_start = -1

    def emit(tok: str, s: int, e: int) -> None:
        tokens.append(tok)
        starts.append(s)
        ends.append(e)

    while i < n:
        ch = text[i]
        if ch == " " and 1 < i < n - 1 and is_chinese(text[i - 1]) and is_chinese(text[i + 1]):
            flush_run(i)
            emit(SENTINEL_SPACE_CJK, i, i)
            i += 1
        elif ch == "\xa0":
            flush_run(i)
            emit(SENTINEL_NBSP, i, i)
            i += 1
        elif ch == "　":
            flush_run(i)
            emit(SENTINEL_IDEO_SPACE, i, i)
            i += 1
        elif ch == "“":
            flush_run(i)
            emit(SENTINEL_LQUOTE, i, i)
            i += 1
        elif ch == "”":
            flush_run(i)
            emit(SENTINEL_RQUOTE, i, i)
            i += 1
        elif ch == " " and i + 1 < n and text[i + 1] == " ":
            flush_run(i)
            emit(SENTINEL_DBL_SPACE, i, i + 1)
            i += 2
        elif ch.isspace():
            flush_run(i)
            i += 1
        elif _is_ascii_alnum(ch):
            if run_start < 0:
                run_start = i
            i += 1
        else:
            flush_run(i)
            emit(ch, i, i)
            i += 1
    flush_run(n)

    if max_tokens is not None and len(tokens) > max_tokens:
        tokens = tokens[:max_tokens]
        starts = starts[:max_tokens]
        ends = ends[:max_tokens]
    return tokens, starts, ends


def hand_features(tokens: list[str], starts: list[int], text: str) -> list[int]:
    """1 if the char under the token is a separator (reference data/lic_2020.py:635-640)."""
    return [1 if text[s] in SPLIT_CHARS else 0 for s in starts]


def find_token_span(
    tokens: list[str], entity_tokens: list[str]
) -> list[tuple[int, int]]:
    """All occurrences of an entity token-sequence within a document token
    sequence (reference main.py:60-72 + utils/kmp.py — we return *all*
    matches like the training-label projector)."""
    out: list[tuple[int, int]] = []
    m = len(entity_tokens)
    if m == 0:
        return out
    for i in range(len(tokens) - m + 1):
        if tokens[i : i + m] == entity_tokens:
            out.append((i, i + m - 1))
    return out

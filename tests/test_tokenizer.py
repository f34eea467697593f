"""Tokenizer + offset alignment unit tests (SURVEY.md §5.1, ST1-ST3).

The invariant under test: text[starts[i] : ends[i]+1] is exactly the surface
covered by token i, for every token and for all whitespace edge cases the
reference special-cases (reference utils/base.py:78-100)."""

from relation_extraction_spark.functions.tokenizer import (
    find_token_span,
    hand_features,
    tokenize_with_offsets,
)

EDGE_TEXTS = [
    "张三 李四是朋友",          # ASCII space between CJK → [unused1]
    "今日\xa0快讯",             # NBSP → [unused2]
    "本报　讯",                  # ideographic space → [unused3]
    "“重磅”消息",               # CJK quotes → [unused4]/[unused5]
    "news  flash now",          # double space → [unused6]
    "李明12在《神作3》中饰演李明5。",
    "ABC Def 123 中文mix99end",
    " leading and trailing ",
    "2019年3月15日在江城7上映",
]


def test_offsets_roundtrip():
    for text in EDGE_TEXTS:
        tokens, starts, ends = tokenize_with_offsets(text)
        assert len(tokens) == len(starts) == len(ends)
        for tok, s, e in zip(tokens, starts, ends):
            surface = text[s : e + 1]
            if tok.startswith("[unused"):
                assert surface in (" ", "\xa0", "　", "“", "”", "  ")
            else:
                assert surface.lower() == tok


def test_sentinels():
    tokens, _, _ = tokenize_with_offsets("张三 李四")
    assert "[unused1]" in tokens
    tokens, _, _ = tokenize_with_offsets("a\xa0b")
    assert tokens == ["a", "[unused2]", "b"]
    tokens, _, _ = tokenize_with_offsets("x  y")
    assert tokens == ["x", "[unused6]", "y"]
    # space at index 1 is NOT sentineled even between CJK (reference quirk:
    # the trigger requires 1 < i < len-1, utils/base.py:83)
    tokens, _, _ = tokenize_with_offsets("三 李四")
    assert "[unused1]" not in tokens


def test_cjk_single_char_and_ascii_runs():
    tokens, starts, ends = tokenize_with_offsets("李明12在ABC")
    assert tokens == ["李", "明", "12", "在", "abc"]
    assert starts == [0, 1, 2, 4, 5]
    assert ends == [0, 1, 3, 4, 7]


def test_truncation():
    text = "汉" * 500
    tokens, starts, ends = tokenize_with_offsets(text, max_tokens=203)
    assert len(tokens) == 203


def test_hand_features():
    text = "《神作1》，好"
    tokens, starts, ends = tokenize_with_offsets(text)
    hf = hand_features(tokens, starts, text)
    assert hf == [1, 0, 0, 0, 1, 1, 0]  # 《 》 ， are separators


def test_find_token_span_all_occurrences():
    tokens, _, _ = tokenize_with_offsets("金曲3是李明5演唱的歌曲，金曲3广受欢迎")
    ent, _, _ = tokenize_with_offsets("金曲3")
    spans = find_token_span(tokens, ent)
    assert len(spans) == 2


def test_determinism():
    for text in EDGE_TEXTS:
        assert tokenize_with_offsets(text) == tokenize_with_offsets(text)


def test_regex_matches_loop_form():
    """The regex fast path must be char-identical to the explicit loop form
    on synthetic corpus text and adversarial random strings."""
    import random

    from relation_extraction_spark.functions.tokenizer import _tokenize_loop
    from relation_extraction_spark.synthetic import gen_row

    for i in range(500):
        t = gen_row(i)["text"]
        assert tokenize_with_offsets(t) == _tokenize_loop(t), repr(t)
    rng = random.Random(7)
    alpha = list("ab 1一汉《》“”，。\xa0　\t\n  Z")
    for _ in range(3000):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        assert tokenize_with_offsets(s) == _tokenize_loop(s), repr(s)

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


# --- WordPiece mode (real vocab, [UNK], subword offsets) ----------------------

_WP_VOCAB = {t: i for i, t in enumerate([
    "[PAD]", "[UNK]", "[unused1]", "[unused2]", "[unused3]", "[unused4]",
    "[unused5]", "[unused6]", "play", "##ing", "##er", "spark", "的", "我",
    "是", "，", "1", "##9", "un", "##believ", "##able",
])}


def _wp():
    from relation_extraction_spark.functions.wordpiece import WordPieceTokenizer

    return WordPieceTokenizer(_WP_VOCAB)


def test_wordpiece_one_to_many_offsets():
    """one-to-many (reference data/lic_2020.py:231-236): one word → several
    ##-pieces, each with its own exact char span."""
    toks, starts, ends = _wp().tokenize_with_offsets("我是playing")
    assert toks == ["我", "是", "play", "##ing"]
    assert (starts, ends) == ([0, 1, 2, 6], [0, 1, 5, 8])
    text = "我是playing"
    assert text[starts[2]:ends[2] + 1] == "play"
    assert text[starts[3]:ends[3] + 1] == "ing"


def test_wordpiece_unk_many_to_one():
    """[UNK] many-to-one (reference data/lic_2020.py:216-230): an
    out-of-vocab word collapses to ONE [UNK] whose span covers the full
    surface — the slice is always recoverable."""
    text = "我是qzxv的playing"
    toks, starts, ends = _wp().tokenize_with_offsets(text)
    assert toks == ["我", "是", "[UNK]", "的", "play", "##ing"]
    i = toks.index("[UNK]")
    assert text[starts[i]:ends[i] + 1] == "qzxv"
    # OOV CJK char → single-char [UNK]
    toks2, s2, e2 = _wp().tokenize_with_offsets("猫是我")
    assert toks2 == ["[UNK]", "是", "我"]
    assert (s2[0], e2[0]) == (0, 0)


def test_wordpiece_sentinels_and_multi_piece():
    text = "我的 是\xa0unbelievable"
    toks, starts, ends = _wp().tokenize_with_offsets(text)
    assert toks == ["我", "的", "[unused1]", "是", "[unused2]", "un", "##believ", "##able"]
    for t, s, e in zip(toks, starts, ends):
        if not t.startswith("["):
            assert text[s:e + 1].lower() == t.replace("##", "")


def test_wordpiece_differential_with_vocab_free():
    """On text where every CJK char and full ASCII word is in vocab, the
    wordpiece path produces the identical tokens and spans as the vocab-free
    path (no splits fire)."""
    from relation_extraction_spark.functions.tokenizer import tokenize_with_offsets

    text = "我是spark，我 是 spark"
    assert _wp().tokenize_with_offsets(text) == tokenize_with_offsets(text)


def test_wordpiece_ids_and_max_tokens():
    wp = _wp()
    toks, starts, ends = wp.tokenize_with_offsets("我是playing", max_tokens=3)
    assert len(toks) == len(starts) == len(ends) == 3
    assert wp.convert_tokens_to_ids(["我", "play", "zzz"]) == [
        _WP_VOCAB["我"], _WP_VOCAB["play"], _WP_VOCAB["[UNK]"]]


def test_tokenize_df_wordpiece_mode(spark):
    from relation_extraction_spark.operators.tokenize import tokenize_df

    docs = spark.createDataFrame(
        [("u1", "我是playing"), ("u2", "spark playing")], "url string, text string")
    out = {r["url"]: r for r in tokenize_df(docs, wordpiece_vocab=_WP_VOCAB).collect()}
    assert out["u1"]["tokens"] == ["我", "是", "play", "##ing"]
    assert out["u1"]["token_ids"] == [
        _WP_VOCAB["我"], _WP_VOCAB["是"], _WP_VOCAB["play"], _WP_VOCAB["##ing"]]
    assert len(out["u2"]["hand"]) == len(out["u2"]["tokens"])
    # vocab-free mode: token_ids null, tokens unsplit
    free = {r["url"]: r for r in tokenize_df(docs).collect()}
    assert free["u1"]["token_ids"] is None
    assert free["u1"]["tokens"] == ["我", "是", "playing"]


def test_wordpiece_reference_vocab_if_present(spark):
    """Gated on the reference's shipped public bert-base-uncased vocab:
    structural invariants over mixed Chinese/English text."""
    import os

    import pytest as _pytest

    path = "/root/reference/utils/bert_base_uncased/vocab.txt"
    if not os.path.exists(path):
        _pytest.skip("reference vocab not present")
    from relation_extraction_spark.functions.wordpiece import (
        WordPieceTokenizer,
        load_vocab,
    )

    vocab = load_vocab(path)
    assert len(vocab) == 30522 and vocab["[UNK]"] == 100
    wp = WordPieceTokenizer(vocab)
    text = "李明在《神作》中饰演李雷，unbelievable performance 1990年"
    toks, starts, ends = wp.tokenize_with_offsets(text)
    assert len(toks) == len(starts) == len(ends) > 0
    ids = wp.convert_tokens_to_ids(toks)
    assert all(0 <= i < 30522 for i in ids)
    # byte identity for every non-special token
    for t, s, e in zip(toks, starts, ends):
        if not t.startswith("["):
            assert text[s:e + 1].lower() == t.replace("##", ""), (t, s, e)
    # the English word must actually subword-split with this vocab
    assert "##able" in toks or "unbelievable" in toks
    assert any(t == "[UNK]" for t in toks) == any(
        wp.vocab.get(c) is None and not c.isascii() for c in text if not c.isspace())


def test_cased_run_fallback_isolated_lower():
    """The bulk-run path must not apply context-sensitive lowering: a Greek
    capital sigma at run end would bulk-lower to final-form 'ς', but the
    per-char contract lowers each char in isolation → 'σ'. The run "ΑΣ"
    (lower() != identity) must take the per-char fallback."""
    toks, starts, ends = tokenize_with_offsets("ΑΣ q")
    assert toks == ["α", "σ", "q"]
    assert starts == [0, 1, 3]
    assert ends == [0, 1, 3]


def test_bulk_run_offsets():
    """Long ordinary runs are emitted via C-level extend — tokens and both
    offset lists must stay per-char exact across run/special boundaries."""
    text = "汉" * 50 + "Ab1" + "。。。"
    toks, starts, ends = tokenize_with_offsets(text)
    assert toks[:50] == ["汉"] * 50
    assert starts[:50] == list(range(50))
    assert ends[:50] == list(range(50))
    assert toks[50] == "ab1" and starts[50] == 50 and ends[50] == 52
    assert toks[51:] == ["。"] * 3
    assert starts[51:] == [53, 54, 55] and ends[51:] == [53, 54, 55]

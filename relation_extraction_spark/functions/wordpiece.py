"""WordPiece tokenizer with a real vocabulary, [UNK], and exact char offsets.

The reference wraps HuggingFace's BertTokenizer over the shipped
``bert_base_uncased/vocab.txt`` (reference utils/base.py:19-111) and then
re-derives token→char offsets with a fragile scanning alignment
(reference data/lic_2020.py:193-262) whose hardest cases are:

* **[UNK] many-to-one** — a word whose pieces aren't in the vocab collapses
  to one [UNK] covering several chars;
* **one-to-many** — one word splits into several ``##``-continued pieces.

This implementation is the public WordPiece algorithm (greedy
longest-match-first, Devlin et al. 2019; same as BERT's reference
tokenizer) re-built from scratch so offsets come out *at tokenize time*:

1. Basic segmentation reuses :func:`tokenizer.tokenize_with_offsets` —
   identical sentinel semantics (6 [unusedN] classes, reference
   utils/base.py:78-100), CJK chars as single-char words, lowercased ASCII
   alnum runs, punctuation as single chars, every word carrying its exact
   char span.
2. Each non-sentinel word is split greedy-longest-match against the vocab
   with ``##`` continuation pieces; a word with no valid split becomes ONE
   [UNK] token whose span covers the whole word (the many-to-one case, with
   the surface always recoverable as ``text[start:end+1]``).

Divergence from BERT's BasicTokenizer, documented: no accent stripping
(NFD-normalizing would change char counts and break the byte-identity
invariant; the reference corpus is Chinese where this never fires).
"""

from __future__ import annotations

from .tokenizer import tokenize_with_offsets

UNK = "[UNK]"
_SENTINELS = frozenset(f"[unused{i}]" for i in range(1, 7))
MAX_WORD_CHARS = 100  # BERT's max_input_chars_per_word


def load_vocab(path: str) -> dict[str, int]:
    """vocab.txt → {token: row index} (the standard BERT vocab format)."""
    vocab: dict[str, int] = {}
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            vocab[line.rstrip("\n")] = i
    return vocab


def wordpiece_split(word: str, vocab: dict[str, int]) -> list[tuple[str, int, int]] | None:
    """Greedy longest-match-first split of one (lowercased) word.

    Returns [(piece, start_off, end_off_inclusive)] with offsets relative to
    the word, or None if the word has no valid split (caller emits [UNK]).
    """
    n = len(word)
    if n > MAX_WORD_CHARS:
        return None
    pieces: list[tuple[str, int, int]] = []
    start = 0
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return None
        pieces.append((cur, start, end - 1))
        start = end
    return pieces


class WordPieceTokenizer:
    """Drop-in for the vocab-free tokenizer: ``tokenize_with_offsets(text)``
    → (tokens, char_starts, char_ends_inclusive), plus id lookup."""

    def __init__(self, vocab: dict[str, int]):
        self.vocab = vocab
        self.unk_id = vocab.get(UNK, 0)

    def tokenize_with_offsets(
        self, text: str, max_tokens: int | None = None
    ) -> tuple[list[str], list[int], list[int]]:
        words, w_starts, w_ends = tokenize_with_offsets(text, max_tokens=None)
        tokens: list[str] = []
        starts: list[int] = []
        ends: list[int] = []
        for w, s, e in zip(words, w_starts, w_ends):
            if w in _SENTINELS:
                tokens.append(w)
                starts.append(s)
                ends.append(e)
                continue
            split = wordpiece_split(w, self.vocab)
            if split is None:  # many-to-one: whole word → [UNK], exact span
                tokens.append(UNK)
                starts.append(s)
                ends.append(e)
            else:  # one-to-many: each piece carries its own exact span
                for piece, ps, pe in split:
                    tokens.append(piece)
                    starts.append(s + ps)
                    ends.append(s + pe)
        if max_tokens is not None and len(tokens) > max_tokens:
            tokens = tokens[:max_tokens]
            starts = starts[:max_tokens]
            ends = ends[:max_tokens]
        return tokens, starts, ends

    def convert_tokens_to_ids(self, tokens: list[str]) -> list[int]:
        return [self.vocab.get(t, self.unk_id) for t in tokens]

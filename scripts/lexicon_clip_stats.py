"""ST4 lexicon-coverage sensitivity for W3 clipping (round-5 verdict #8).

The reference segments with a trained pkuseg model (reference
data/lic_2020.py:577-596); this repo ships DictSegmenter over a 2.2k-word
lexicon. The open question was whether W3's word-run clipping is sensitive
to lexicon SIZE — i.e. would a 10× dictionary change decode behavior on
OOV-heavy text. Instead of hand-growing a dictionary 10×, this harness
measures the sensitivity curve directly: run the exact tokenize → word-run
→ CLIP_LEN clip pipeline over the synthetic corpus with deterministic
lexicon subsamples (10% / 25% / 50% / 100%) plus the vocab-free segmenter,
and report

- words/doc and mean word length (segmentation granularity),
- clip events per 1k docs (how often W3 fires at all),
- clip-surface agreement vs the full-lexicon run (the decode-visible
  delta: fraction of (doc, span-start) clip events whose clipped surface
  string is identical to the 100% run).

If agreement saturates as coverage grows (50% ≈ 100%), the marginal word
changes almost no clip decision on this corpus and a 10× lexicon is noise;
the curve, not an assertion, is the recorded evidence.

Also runs a jieba/pkuseg differential IF such a segmenter is importable in
the environment (it is not in this container — the harness prints SKIPPED;
the code path is exercised wherever the library exists).

Usage:  PYTHONPATH=/root/repo python scripts/lexicon_clip_stats.py [n_docs]
"""

from __future__ import annotations

import hashlib
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from relation_extraction_spark.operators.decode import (  # noqa: E402
    CLIP_LEN,
    MIN_KEEP,
    word_limit_maps,
)
from relation_extraction_spark.operators.tokenize import (  # noqa: E402
    DictSegmenter,
    load_cjk_lexicon,
    tokenize_document,
)
from relation_extraction_spark.synthetic import gen_row  # noqa: E402


def subsample(lex: list[str], frac: float) -> list[str]:
    """Deterministic coverage subsample: keep a word iff md5(word) lands in
    the lowest `frac` of hash space (stable across runs/machines)."""
    if frac >= 1.0:
        return lex
    cut = int(frac * 2**32)
    return [w for w in lex
            if int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "big") < cut]


def clip_events(segmenter, n_docs: int) -> tuple[dict, dict[tuple, str]]:
    """All W3 clip decisions over the corpus: {(doc, span_start): clipped
    surface}, plus segmentation summary stats. Mirrors the forward-pass
    clip condition of decode_channel (span > CLIP_LEN tokens starting at a
    word-run start with a viable run limit)."""
    events: dict[tuple, str] = {}
    n_words = n_tokens = 0
    word_chars = 0
    for i in range(n_docs):
        r = gen_row(i)
        if r["lang"] != "zh":
            continue
        row = tokenize_document(f"u{i}", r["text"], {}, None, segmenter)
        toks = row["tokens"]
        b2w = np.array(row["b2w"])
        n = len(toks)
        n_tokens += n
        n_words += len(set(b2w.tolist()))
        word_chars += sum(len(t) for t in toks)
        mask = np.zeros(n, dtype=bool)
        if n >= 2:
            same = b2w[:-1] == b2w[1:]
            mask[:-1] |= same
            mask[1:] |= same
        ps, pe = word_limit_maps(mask)
        e = n - 1
        for s in range(n):
            at_run_start = mask[s] and (s == 0 or not mask[s - 1])
            if (at_run_start and e - s > CLIP_LEN
                    and pe[s] - s > MIN_KEEP and e > pe[s]):
                events[(i, s)] = "".join(toks[s:int(pe[s]) + 1])
    stats = {"tokens": n_tokens, "words": n_words,
             "mean_word_len": round(word_chars / max(n_words, 1), 3)}
    return stats, events


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    lex = load_cjk_lexicon()
    full_stats, full_events = clip_events(DictSegmenter(lex), n_docs)

    print(f"corpus: {n_docs} docs; full lexicon {len(lex)} words")
    print("| lexicon | words | clip events | vs-full agreement |"
          " mean word len |")
    print("|---|---|---|---|---|")
    rows = [("vocab-free", None)] + [
        (f"{int(f * 100)}%", subsample(lex, f)) for f in (0.10, 0.25, 0.50)
    ] + [("100%", lex)]
    for label, sub in rows:
        seg = None if sub is None else DictSegmenter(sub)
        stats, events = clip_events(seg, n_docs) if sub is not lex \
            else (full_stats, full_events)
        both = set(events) & set(full_events)
        union = set(events) | set(full_events)
        agree = (sum(events[k] == full_events[k] for k in both)
                 / max(len(union), 1))
        print(f"| {label} ({len(sub) if sub is not None else 0}w) "
              f"| {stats['words']} | {len(events)} | {agree:.3f} "
              f"| {stats['mean_word_len']} |", flush=True)

    # real-segmenter differential, where the library exists
    try:
        import jieba  # type: ignore
    except ImportError:
        print("\njieba differential: SKIPPED (library not installed — "
              "container has no pip; run where jieba/pkuseg exists)")
        return
    seg_lex = DictSegmenter(lex)
    same = tot = 0
    for i in range(min(n_docs, 200)):
        r = gen_row(i)
        if r["lang"] != "zh":
            continue
        text = re.sub(r"\s", "", r["text"])
        ours = {w for w, _, _ in seg_lex(text) if len(w) >= 2}
        theirs = {w for w in jieba.cut(text) if len(w) >= 2}
        same += len(ours & theirs)
        tot += len(ours | theirs)
    print(f"\njieba word agreement (multi-char words, {min(n_docs, 200)} "
          f"docs): {same / max(tot, 1):.3f}")


if __name__ == "__main__":
    main()

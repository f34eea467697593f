"""HotPoint alternate decode path (N11/J9) unit tests."""

import numpy as np

from relation_extraction_spark.operators.hotpoint import (
    decode_hotpoint,
    find_entities_hb,
    pair_by_hotpoint,
    pair_by_rules,
)

TOKENS = list("abcdefghij")


def bools(n, idx):
    a = np.zeros(n, dtype=bool)
    a[list(idx)] = True
    return a


def test_find_entities_end_mode():
    # entity span (2,4): head at end=4, body on 2..3, body[1] false
    head = bools(10, [4])
    body = bools(10, [2, 3])
    keys, groups = find_entities_hb(TOKENS, head, body, mode="end")
    assert groups == [[(2, 4)]]
    assert keys == [("c", "d", "e")]


def test_find_entities_start_mode():
    head = bools(10, [2])
    body = bools(10, [3, 4])
    keys, groups = find_entities_hb(TOKENS, head, body, mode="start")
    assert groups == [[(2, 4)]]


def test_pair_by_hotpoint_end_anchor():
    sk, sg = [("a",)], [[(0, 1)]]
    ok, og = [("x",)], [[(4, 5)]]
    pm = np.zeros((10, 10), dtype=bool)
    pm[1][5] = True  # end anchors
    pairs = pair_by_hotpoint(sk, ok, sg, og, pm, mode="end")
    assert pairs == [((0, 1), (4, 5))]
    pm[1][5] = False
    assert pair_by_hotpoint(sk, ok, sg, og, pm, mode="end") == []


def test_rules_single_subject():
    sk, sg = [("s",)], [[(0, 0)]]
    ok, og = [("o1",), ("o2",)], [[(3, 3)], [(5, 5)]]
    pairs = pair_by_rules(sk, ok, sg, og)
    assert pairs == [((0, 0), (3, 3)), ((0, 0), (5, 5))]


def test_rules_nearest():
    # 2 subjects x 2 objects, each single occurrence but NOT aligned sequence
    # (different lengths trigger... keep equal length but multi-occurrence to
    # defeat is_sequence): subject 0 at (0,0)+(9,9)
    sk = [("s1",), ("s2",)]
    sg = [[(0, 0), (9, 9)], [(6, 6)]]
    ok = [("o1",), ("o2",)]
    og = [[(1, 1)], [(7, 7)]]
    pairs = pair_by_rules(sk, ok, sg, og)
    # s1: nearest object occurrence to 0 or 9 → o2 at 7 (dist 2) vs o1 at 1
    # (dist 1 from 0) → min dist 1 → o1; pairing uses subject's FIRST point
    assert ((0, 0), (1, 1)) in pairs
    # s2 at 6: nearest is o2 at 7 (dist 1)
    assert ((6, 6), (7, 7)) in pairs


def test_rules_aligned_sequence_swap():
    # equal counts, single occurrences, first pair collides on same span
    sk = [("x",), ("y",)]
    sg = [[(2, 2)], [(5, 5)]]
    ok = [("x",), ("z",)]
    og = [[(2, 2)], [(7, 7)]]
    pairs = pair_by_rules(sk, ok, sg, og)
    # collision at index 0 → cross-pair (0→1) and (1→0)
    assert pairs == [((2, 2), (7, 7)), ((5, 5), (2, 2))]


def test_decode_hotpoint_end_to_end():
    tokens = list("abcdefghij")
    inside = bools(10, [0, 4])  # bodies for spans (0,1) and (4,5)
    heads = {3: (bools(10, [1]), bools(10, [5]))}
    pm = np.zeros((10, 10), dtype=bool)
    pm[1][5] = True
    spos = decode_hotpoint(tokens, heads, inside, pm)
    assert spos == [((0, 1), 3, (4, 5))]
    # without the hotpoint map → artificial rules (1-subject) pair anyway
    spos2 = decode_hotpoint(tokens, heads, inside, None)
    assert spos2 == [((0, 1), 3, (4, 5))]


def test_hotpoint_path_matches_primary_on_corpus():
    """The alternate HotPoint decode path must produce the same final triples
    as the primary CasRel-style path on the synthetic corpus (both feed the
    same formalize/combine/postprocess tail)."""
    from relation_extraction_spark.operators.extract_triples import decode_document
    from relation_extraction_spark.operators.hotpoint import decode_document_hotpoint
    from relation_extraction_spark.operators.scorer import SurrogateScorer
    from relation_extraction_spark.synthetic import gen_row

    primary = SurrogateScorer()
    key = lambda t: (t["subject_type"], t["subject"], t["predicate"],  # noqa: E731
                     tuple(sorted(t["object"].items())))
    mismatches = total = 0
    for i in range(200):
        r = gen_row(i)
        if r["lang"] != "zh":
            continue
        a = {key(t) for t in decode_document(r["text"], primary)}
        b = {key(t) for t in decode_document_hotpoint(r["text"])}
        total += len(a)
        mismatches += len(a ^ b)
    assert total > 0
    assert mismatches / total < 0.02, (mismatches, total)

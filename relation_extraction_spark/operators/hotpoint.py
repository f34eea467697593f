"""HotPoint alternate decode path (N11/J9 — reference model/baidu_baseline.py).

The reference's second model family tags, per predicate channel, entity END
positions plus an "inside" line, grows spans backward through the inside
mask, and pairs subjects with objects through an L×L pairwise compatibility
map (J9) or artificial rules (1-subject / 1-object first-pair, aligned
sequence, nearest-by-midpoint — reference model/baidu_baseline.py:143-366).
The CasRel cascade (operators/decode.py) is the primary path; this module
reproduces the alternate semantics for parity coverage. All functions are
pure per-document kernels usable inside the same fused Arrow stage.
"""

from __future__ import annotations

import numpy as np

Span = tuple[int, int]


def find_entities_hb(
    tokens: list[str], head: np.ndarray, body: np.ndarray, mode: str = "end"
) -> tuple[list[tuple[str, ...]], list[list[Span]]]:
    """Head/body span growth. mode='start': head marks entity starts, spans
    grow forward through body; mode='end': head marks ends, spans grow
    backward (reference model/baidu_baseline.py:144-183). Occurrence lists
    are appended without dedup, matching the reference."""
    keys: list[tuple[str, ...]] = []
    groups: list[list[Span]] = []
    n = len(tokens)

    def add(s: int, e: int) -> None:
        key = tuple(tokens[s : e + 1])
        try:
            groups[keys.index(key)].append((s, e))
        except ValueError:
            keys.append(key)
            groups.append([(s, e)])

    if mode == "start":
        for i in range(n):
            if head[i]:
                e = i
                for j in range(i + 1, n):
                    if body[j]:
                        e = j
                    else:
                        break
                add(i, e)
    elif mode == "end":
        for i in range(n - 1, -1, -1):
            if head[i]:
                s = i
                for j in range(i - 1, -1, -1):
                    if body[j]:
                        s = j
                    else:
                        break
                add(s, i)
    else:
        raise ValueError(mode)
    return keys, groups


def pair_by_hotpoint(
    sbj_keys, obj_keys, sbj_groups, obj_groups, point_map: np.ndarray, mode: str = "end"
) -> list[tuple[Span, Span]]:
    """J9 pairing: first (sbj_span, obj_span) combination whose anchor pair
    fires in the L×L map; one pair per (subject, object) entity combination
    (reference model/baidu_baseline.py:185-205)."""
    out: list[tuple[Span, Span]] = []
    anchor = (lambda p: p[0]) if mode == "start" else (lambda p: p[1])
    for si in range(len(sbj_groups)):
        for oi in range(len(obj_groups)):
            done = False
            for sp in sbj_groups[si]:
                for op in obj_groups[oi]:
                    if sp == op:
                        continue
                    if point_map[anchor(sp)][anchor(op)]:
                        out.append((sp, op))
                        done = True
                        break
                if done:
                    break
    return out


def pair_by_rules(
    sbj_keys, obj_keys, sbj_groups, obj_groups
) -> list[tuple[Span, Span]]:
    """Artificial pairing rules (reference model/baidu_baseline.py:207-294):
    single-subject / single-object first-pair; aligned equal-length
    single-occurrence sequence with the start-collision swap; else
    nearest-object-by-span-midpoint (ties: LAST seen at min distance wins,
    paired object point is the object's FIRST occurrence)."""
    out: list[tuple[Span, Span]] = []

    def first_pair(fix_groups, scan_groups, fix_is_sbj: bool):
        res = []
        for fi in range(len(fix_groups)):
            for si in range(len(scan_groups)):
                done = False
                for fp in fix_groups[fi]:
                    for sp in scan_groups[si]:
                        if fp != sp:
                            res.append((fp, sp) if fix_is_sbj else (sp, fp))
                            done = True
                            break
                    if done:
                        break
        return res

    if len(sbj_keys) == 1:
        return first_pair(sbj_groups, obj_groups, True)
    if len(obj_keys) == 1:
        # reference scans objects outer, subjects inner
        res = []
        for oi in range(len(obj_groups)):
            for si in range(len(sbj_groups)):
                done = False
                for op in obj_groups[oi]:
                    for sp in sbj_groups[si]:
                        if sp != op:
                            res.append((sp, op))
                            done = True
                            break
                    if done:
                        break
        return res

    def is_sequence() -> bool:
        if len(sbj_keys) != len(obj_keys):
            return False
        return all(len(g) == 1 for g in sbj_groups + obj_groups)

    if is_sequence():
        i = 0
        while i < len(sbj_keys):
            if sbj_groups[i][0] == obj_groups[i][0]:
                if i != len(sbj_keys) - 1:
                    out.append((sbj_groups[i][0], obj_groups[i + 1][0]))
                    out.append((sbj_groups[i + 1][0], obj_groups[i][0]))
                    i += 2
                else:
                    if out:
                        out[-1] = (out[-1][0], obj_groups[i][0])
                    out.append((sbj_groups[i][0], obj_groups[i - 1][0]))
                    i += 1
            else:
                out.append((sbj_groups[i][0], obj_groups[i][0]))
                i += 1
        return out

    if len(sbj_keys) >= 2 and len(obj_keys) >= 2:
        for si in range(len(sbj_keys)):
            nearest_oi = None
            nearest_op: Span | None = None
            nearest = 999.0
            for sp in sbj_groups[si]:
                mid_s = (sp[0] + sp[1]) / 2
                for oi in range(len(obj_keys)):
                    for op in obj_groups[oi]:
                        mid_o = (op[0] + op[1]) / 2
                        d = abs(mid_s - mid_o)
                        if d <= nearest and sp != op:
                            nearest = d
                            nearest_oi = oi
                            nearest_op = obj_groups[oi][0]
            if nearest_oi is not None:
                out.append((sbj_groups[si][0], nearest_op))
    return out


def decode_hotpoint(
    tokens: list[str],
    channel_heads: dict[int, tuple[np.ndarray, np.ndarray]],
    inside_line: np.ndarray,
    point_map: np.ndarray | None,
) -> list[tuple[Span, int, Span]]:
    """Per-predicate decode: channel_heads[pred] = (sbj_end_bool, obj_end_bool);
    pairs via hotpoint map when given, else artificial rules. Returns
    (sbj_span, predicate_id, obj_span) triples."""
    spos: list[tuple[Span, int, Span]] = []
    for pred_id in sorted(channel_heads.keys()):
        sbj_head, obj_head = channel_heads[pred_id]
        sk, sg = find_entities_hb(tokens, sbj_head, inside_line, mode="end")
        ok, og = find_entities_hb(tokens, obj_head, inside_line, mode="end")
        if not sk or not ok:
            continue
        if point_map is not None:
            pairs = pair_by_hotpoint(sk, ok, sg, og, point_map, mode="end")
        else:
            pairs = pair_by_rules(sk, ok, sg, og)
        spos.extend((sp, pred_id, op) for sp, op in pairs)
    return spos


class HotPointSurrogateScorer:
    """Surrogate for the alternate model family (reference model/
    baidu_baseline.py): per-predicate entity-END channels, an inside line,
    and the L×L subject-end × object-end compatibility map, derived from the
    same template grammar as the primary scorer."""

    def score(self, text: str):
        from ..functions.tokenizer import tokenize_with_offsets
        from ..schema import MAX_TOKENS, PRED2ID
        from .scorer import _RULES, _all_occurrences

        tokens, starts, ends = tokenize_with_offsets(text, MAX_TOKENS)
        start_of = {s: t for t, s in enumerate(starts)}
        end_of = {e: t for t, e in enumerate(ends)}
        n = len(tokens)
        inside = np.zeros(n, dtype=bool)
        heads: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        hot = np.zeros((n, n), dtype=bool)

        def tok_span(cs, ce):
            ts, te = start_of.get(cs), end_of.get(ce)
            return None if ts is None or te is None else (ts, te)

        def mark(ch, span, is_sbj):
            ts, te = span
            s_arr, o_arr = heads.setdefault(
                ch, (np.zeros(n, dtype=bool), np.zeros(n, dtype=bool)))
            (s_arr if is_sbj else o_arr)[te] = True
            inside[ts:te] = True  # body covers [start, end) — end excluded

        for rx, emits in _RULES:
            for m in rx.finditer(text):
                for g_sbj, _sbj_type, pred, g_obj in emits:
                    ch = PRED2ID[pred]
                    obj_span = tok_span(m.start(g_obj), m.end(g_obj) - 1)
                    if obj_span is None:
                        continue
                    mark(ch, obj_span, is_sbj=False)
                    for cs, ce in _all_occurrences(text, m.group(g_sbj)):
                        sbj_span = tok_span(cs, ce)
                        if sbj_span is None:
                            continue
                        mark(ch, sbj_span, is_sbj=True)
                        hot[sbj_span[1]][obj_span[1]] = True
        return tokens, starts, ends, heads, inside, hot


def extract_triples_hotpoint(docs, scorer=None, lang: str | None = "zh"):
    """DataFrame twin of extract_triples on the HotPoint alternate path —
    the same shared fused single-stage mapInPandas, zero shuffles."""
    from .extract_triples import fused_extract_stage

    scorer = scorer or HotPointSurrogateScorer()
    return fused_extract_stage(
        docs, lambda text: decode_document_hotpoint(text, scorer), lang)


def decode_document_hotpoint(text: str, scorer=None) -> list[dict]:
    """Alternate-path twin of extract_triples.decode_document: HotPoint decode
    feeding the same formalize → combine → postprocess tail."""
    from ..schema import ID2PRED, MY_SCHEMA_DICT
    from .rewrite import combine_spos, postprocess_1

    scorer = scorer or HotPointSurrogateScorer()
    tokens, starts, ends, heads, inside, hot = scorer.score(text)
    if not heads:
        return []
    spos_tok = decode_hotpoint(tokens, heads, inside, hot)

    def surface(span):
        s, e = span
        return text[starts[s] : ends[e] + 1].strip()

    spos = []
    for sbj_span, pred_id, obj_span in spos_tok:
        pred = ID2PRED[pred_id]
        st, ot = MY_SCHEMA_DICT[pred]
        spos.append({
            "subject_type": st, "subject": surface(sbj_span), "predicate": pred,
            "object_type": {"@value": ot["@value"]},
            "object": {"@value": surface(obj_span)},
        })
    return postprocess_1(text, combine_spos(spos))

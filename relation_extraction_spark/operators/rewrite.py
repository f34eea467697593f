"""Triple rewrite rules R1-R5: decompose/recompose complex triples, derived
relations, projection (SURVEY.md §2.11).

Semantics re-derived from the reference (NOT copied):
* expand_spo — complex→simple decomposition, defines the 48→54 predicate
  expansion (reference data/lic_2020.py:313-391). Pure per-row rule → also
  exposed as a Catalyst column expression in :func:`expand_spo_df`.
* combine_spos — in-document recomposition with list-consumption semantics
  (data/lic_2020.py:394-574). Order-sensitive: targets are consumed in list
  order, helpers are matched in list order; helper triples are never emitted;
  an unmatched 饰演 is dropped while unmatched 配音/上映时间/票房/获奖 are kept
  simple — all replicated exactly.
* postprocess_1 — add_period backward digit scan for 获奖 (data/lic_2020.py:
  113-140), home_relation family derivation (142-174), projection + ordered
  dedup (181-190).
* simplify_schema — 丈夫 → inverse 妻子 (data/lic_2020.py:645-656).
* clean — empty-entity / degenerate-self-loop filters + raw-schema type
  re-attachment (data/lic_2020.py:679-704).

The kernels are plain-Python per-document functions so the fused extraction
stage applies them inside ``mapInPandas`` with zero extra shuffle; the ``_df``
wrappers run them as grouped Arrow stages for standalone DataFrame use.
"""

from __future__ import annotations

from typing import Any

from ..schema import (
    COMBINE_PREDICATES,
    MY_SCHEMA_DICT,
    RAW_SCHEMA_DICT,
    SELF_LOOP_OK,
)

Spo = dict[str, Any]

PERIOD_CHARS = "0123456789一二三四五六七八九十零首"


def _spo(subject_type: str, subject: str, predicate: str,
         object_type: dict[str, str], obj: dict[str, str]) -> Spo:
    return {
        "subject_type": subject_type,
        "subject": subject,
        "predicate": predicate,
        "object_type": object_type,
        "object": obj,
    }


# --------------------------------------------------------------------------
# R1: expand (complex → simple). Reference data/lic_2020.py:313-391.
# --------------------------------------------------------------------------

def expand_spo(spo: Spo) -> list[Spo]:
    p = spo["predicate"]
    obj = spo["object"]
    out: list[Spo] = []
    if p == "配音":
        out.append(_spo("娱乐人物", spo["subject"], "配音", {"@value": "人物"}, {"@value": obj["@value"]}))
        if "inWork" in obj:
            out.append(_spo("影视作品", obj["inWork"], "角色", {"@value": "人物"}, {"@value": obj["@value"]}))
    elif p == "上映时间":
        out.append(_spo("影视作品", spo["subject"], "上映时间", {"@value": "Date"}, {"@value": obj["@value"]}))
        if "inArea" in obj:
            out.append(_spo("地点", obj["inArea"], "上映地点-时间", {"@value": "Date"}, {"@value": obj["@value"]}))
    elif p == "票房":
        out.append(_spo("影视作品", spo["subject"], "票房", {"@value": "Number"}, {"@value": obj["@value"]}))
        if "inArea" in obj:
            out.append(_spo("Number", obj["@value"], "票房区域", {"@value": "地点"}, {"@value": obj["inArea"]}))
    elif p == "获奖":
        out.append(_spo("娱乐人物", spo["subject"], "获奖", {"@value": "奖项"}, {"@value": obj["@value"]}))
        if "inWork" in obj:
            out.append(_spo("娱乐人物", spo["subject"], "作品", {"@value": "作品"}, {"@value": obj["inWork"]}))
            out.append(_spo("作品", obj["inWork"], "作品获奖", {"@value": "奖项"}, {"@value": obj["@value"]}))
        if "onDate" in obj:
            out.append(_spo("奖项", obj["@value"], "奖项时间", {"@value": "Date"}, {"@value": obj["onDate"]}))
        # the 'period' slot is intentionally dropped on expansion; it is
        # re-derived from text by postprocess_1/add_period
    elif p == "饰演":
        out.append(_spo("娱乐人物", spo["subject"], "饰演", {"@value": "人物"}, {"@value": obj["@value"]}))
        if "inWork" in obj:
            out.append(_spo("影视作品", obj["inWork"], "角色", {"@value": "人物"}, {"@value": obj["@value"]}))
            out.append(_spo("人物", spo["subject"], "参与影视作品", {"@value": "影视作品"}, {"@value": obj["inWork"]}))
    else:
        out.append(spo)
    return out


# --------------------------------------------------------------------------
# R2: combine (simple → complex). Reference data/lic_2020.py:394-574.
# --------------------------------------------------------------------------

def _pop_first(spos: list[Spo], predicate: str) -> Spo | None:
    for i, s in enumerate(spos):
        if s["predicate"] == predicate:
            return spos.pop(i)
    return None


def _combine_dub(spos: list[Spo]) -> list[Spo]:
    out: list[Spo] = []
    while True:
        target = _pop_first(spos, "配音")
        if target is None:
            return out
        matched = False
        for s in spos:
            if s["predicate"] == "角色" and s["object"]["@value"] == target["object"]["@value"]:
                out.append(_spo("娱乐人物", target["subject"], "配音",
                                {"inWork": "影视作品", "@value": "人物"},
                                {"inWork": s["subject"], "@value": s["object"]["@value"]}))
                matched = True
        if not matched:
            out.append(target)


def _combine_release_date(spos: list[Spo]) -> list[Spo]:
    out: list[Spo] = []
    while True:
        target = _pop_first(spos, "上映时间")
        if target is None:
            return out
        combined = target
        for s in spos:
            if s["predicate"] == "上映地点-时间" and s["object"]["@value"] == target["object"]["@value"]:
                combined = _spo("影视作品", target["subject"], "上映时间",
                                {"inArea": "地点", "@value": "Date"},
                                {"inArea": s["subject"], "@value": target["object"]["@value"]})
                break
        out.append(combined)


def _combine_box_office(spos: list[Spo]) -> list[Spo]:
    out: list[Spo] = []
    while True:
        target = _pop_first(spos, "票房")
        if target is None:
            return out
        combined = target
        for s in spos:
            if s["predicate"] == "票房区域" and s["subject"] == target["object"]["@value"]:
                combined = _spo("影视作品", target["subject"], "票房",
                                {"inArea": "地点", "@value": "Number"},
                                {"inArea": s["object"]["@value"], "@value": target["object"]["@value"]})
                break
        out.append(combined)


def _combine_win_a_prize(spos: list[Spo]) -> list[Spo]:
    # stage 1: 作品 ⋈ 作品获奖 → intermediate 人物-作品-奖项 (helper kept)
    intermediates: list[Spo] = []
    while True:
        work = _pop_first(spos, "作品")
        if work is None:
            break
        for s in spos:
            if s["predicate"] == "作品获奖" and s["subject"] == work["object"]["@value"]:
                intermediates.append(_spo("娱乐人物", work["subject"], "人物-作品-奖项",
                                          {"inWork": "作品", "@value": "奖项"},
                                          {"inWork": s["subject"], "@value": s["object"]["@value"]}))
    spos.extend(intermediates)

    # stage 2: 获奖 merges at most one 奖项时间 and one 人物-作品-奖项 (both consumed)
    out: list[Spo] = []
    while True:
        target = _pop_first(spos, "获奖")
        if target is None:
            return out
        award = target["object"]["@value"]
        combined = _spo("娱乐人物", target["subject"], "获奖",
                        {"@value": "奖项"}, {"@value": award})
        need_date = True
        need_work = True
        for s in spos[:]:
            if need_date and s["predicate"] == "奖项时间" and s["subject"] == award:
                combined["object_type"]["onDate"] = "Date"
                combined["object"]["onDate"] = s["object"]["@value"]
                spos.remove(s)
                need_date = False
            elif (need_work and s["predicate"] == "人物-作品-奖项"
                  and s["subject"] == target["subject"]
                  and s["object"]["@value"] == award):
                combined["object_type"]["inWork"] = "作品"
                combined["object"]["inWork"] = s["object"]["inWork"]
                spos.remove(s)
                need_work = False
        out.append(combined)


def _combine_portray(spos: list[Spo]) -> list[Spo]:
    # stage 1: 参与影视作品 ⋈ 角色 → intermediate 娱乐人物-影视作品-人物
    intermediates: list[Spo] = []
    while True:
        part = _pop_first(spos, "参与影视作品")
        if part is None:
            break
        for s in spos:
            if s["predicate"] == "角色" and s["subject"] == part["object"]["@value"]:
                intermediates.append(_spo("娱乐人物", part["subject"], "娱乐人物-影视作品-人物",
                                          {"inWork": "影视作品", "@value": "人物"},
                                          {"inWork": s["subject"], "@value": s["object"]["@value"]}))
    spos.extend(intermediates)

    # stage 2: each 饰演 emits one complex per matching intermediate;
    # an unmatched 饰演 is dropped (reference behavior, data/lic_2020.py:540-556)
    out: list[Spo] = []
    while True:
        target = _pop_first(spos, "饰演")
        if target is None:
            return out
        for s in spos:
            if (s["predicate"] == "娱乐人物-影视作品-人物"
                    and s["subject"] == target["subject"]
                    and s["object"]["@value"] == target["object"]["@value"]):
                out.append(_spo("娱乐人物", target["subject"], "饰演",
                                {"inWork": "影视作品", "@value": "人物"},
                                {"inWork": s["object"]["inWork"], "@value": s["object"]["@value"]}))


def combine_spos(spos: list[Spo]) -> list[Spo]:
    """Recompose simple triples into complex ones within one document."""
    waiting: list[Spo] = []
    out: list[Spo] = []
    for s in spos:
        (waiting if s["predicate"] in COMBINE_PREDICATES else out).append(s)
    if not waiting:  # nothing combinable — each pass below would no-op
        return out
    out.extend(_combine_dub(waiting))
    out.extend(_combine_release_date(waiting))
    out.extend(_combine_box_office(waiting))
    out.extend(_combine_win_a_prize(waiting))
    out.extend(_combine_portray(waiting))
    return out


# --------------------------------------------------------------------------
# R3: postprocess_1 (add_period + home_relation + ordered dedup).
# Reference data/lic_2020.py:112-190.
# --------------------------------------------------------------------------

def add_period(text: str, spo: Spo) -> Spo:
    if spo["predicate"] != "获奖":
        return spo
    i = text.find(spo["object"]["@value"]) - 1
    if i < -len(text):
        return spo
    while text[i] == " ":
        i -= 1
        if i < -len(text):
            return spo
    if text[i] in ("届", "回"):
        period = ""
        for j in range(i - 1, -1, -1):
            ch = text[j]
            if ch in PERIOD_CHARS:
                if ch == "首":
                    period = ch
                    break
                period = ch + period
            else:
                break
        if period:
            spo = dict(spo)
            spo["object_type"] = {**spo["object_type"], "period": "Number"}
            spo["object"] = {**spo["object"], "period": period}
    return spo


def home_relation(spos: list[Spo]) -> list[Spo]:
    families: dict[str, dict[str, str]] = {}
    derived: list[Spo] = []
    for s in spos:
        if s["predicate"] == "父亲":
            families.setdefault(s["subject"], {"father": "", "mother": ""})["father"] = s["object"]["@value"]
        elif s["predicate"] == "母亲":
            families.setdefault(s["subject"], {"father": "", "mother": ""})["mother"] = s["object"]["@value"]
        if s["predicate"] == "妻子":
            derived.append(_spo("人物", s["object"]["@value"], "丈夫",
                                {"@value": "人物"}, {"@value": s["subject"]}))
    for fam in families.values():
        if fam["mother"] and fam["father"] and fam["mother"] != fam["father"]:
            derived.append(_spo("人物", fam["mother"], "丈夫", {"@value": "人物"}, {"@value": fam["father"]}))
            derived.append(_spo("人物", fam["father"], "妻子", {"@value": "人物"}, {"@value": fam["mother"]}))
    out = list(spos)
    for s in derived:
        if s not in out:
            out.append(s)
    return out


def postprocess_1(text: str, spos: list[Spo]) -> list[Spo]:
    spos = [add_period(text, s) for s in spos]
    spos = home_relation(spos)
    out: list[Spo] = []
    for s in spos:
        projected = _spo(s["subject_type"], s["subject"], s["predicate"],
                         s["object_type"], s["object"])
        if projected not in out:
            out.append(projected)
    return out


# --------------------------------------------------------------------------
# R4: simplify_schema (丈夫 → inverse 妻子). Reference data/lic_2020.py:645-656.
# --------------------------------------------------------------------------

def simplify_schema(spos: list[Spo]) -> list[Spo]:
    out: list[Spo] = []
    for s in spos:
        if s["predicate"] == "丈夫":
            s = _spo(s["object_type"]["@value"], s["object"]["@value"], "妻子",
                     {"@value": s["subject_type"]}, {"@value": s["subject"]})
        if s not in out:
            out.append(s)
    return out


# --------------------------------------------------------------------------
# clean: F1/F2 filters + raw-schema type re-attachment.
# Reference data/lic_2020.py:679-704.
# --------------------------------------------------------------------------

def clean_spos(spos: list[Spo]) -> list[Spo]:
    out: list[Spo] = []
    for s in spos:
        if not s["subject"]:
            continue
        obj: dict[str, str] = {}
        obj_type: dict[str, str] = {}
        raw = RAW_SCHEMA_DICT.get(s["predicate"])
        if raw is None:
            continue
        degenerate = False
        for key, val in s["object"].items():
            if val:
                obj_type[key] = raw[1][key]
                obj[key] = val
            if s["predicate"] not in SELF_LOOP_OK and s["subject"] == val:
                degenerate = True
                break
        if degenerate or not obj:
            continue
        new = _spo(raw[0], s["subject"], s["predicate"], obj_type, obj)
        if new not in out:
            out.append(new)
    return out


# --------------------------------------------------------------------------
# F6 / correct_type: re-derive types from the predicate (utils/kg.py:582-585).
# --------------------------------------------------------------------------

def correct_type(spo: Spo) -> Spo:
    st, ot = MY_SCHEMA_DICT[spo["predicate"]]
    spo = dict(spo)
    spo["subject_type"] = st
    spo["object_type"] = {**spo["object_type"], "@value": ot["@value"]}
    return spo

"""N10: weighted probability-ensemble of scorers (reference main.py:712-765).

The reference averages subject/word probability maps over k models with
weights (`sbj_ave += sbj_points * w`, main.py:748-752), decodes subjects ONCE
on the averaged maps against the 0.5 point threshold (model/hbt.py:16), then
averages the per-model object maps conditioned on the shared subjects
(`obj_ave += predicate_2(...) * w`, main.py:758-760) and decodes objects
once. model/hbt.py:117-120 applies a pow() to each probability map before
thresholding — exposed here as ``power`` (reference exponent 1).

This wrapper accepts per-channel maps in either form and mixes them freely:

* **sparse {0,1}**: ``(start_idx_array, end_idx_array)`` int index sets —
  the surrogate-scorer interface. Weighted averaging over indicator maps
  reduces to weighted voting: a point survives iff the summed weight of
  scorers firing it exceeds the threshold. Outputs are bit-identical to the
  old binary-vote implementation.
* **dense float**: ``(start_probs, end_probs)`` float arrays of length
  n_tokens — the real probabilistic-scorer interface (BERT/DGCNN scores).
  ``acc = Σ w·p^power``; points = indices with acc > threshold.

The dataflow is the reference's exactly: shared subject decode on the
averaged subject/word maps, then shared object decode — and it plugs into
the same fused extraction stage unchanged.
"""

from __future__ import annotations

import numpy as np


def _dense(map_pair, n: int, power: float) -> tuple[np.ndarray, np.ndarray]:
    """(idx arrays | prob arrays) → (start_probs^power, end_probs^power)."""
    out = []
    for a in map_pair:
        a = np.asarray(a)
        if a.dtype.kind == "f":
            if len(a) != n:
                raise ValueError(f"dense prob map has length {len(a)}, expected {n}")
            d = a.astype(float)
        else:  # sparse index set → 0/1 indicator
            d = np.zeros(n)
            d[a.astype(np.int64)] = 1.0
        out.append(d if power == 1.0 else np.power(d, power))
    return out[0], out[1]


class EnsembleScorer:
    def __init__(self, scorers: list, weights: list[float],
                 threshold: float = 0.5, power: float = 1.0):
        assert len(scorers) == len(weights)
        self.scorers = scorers
        self.weights = weights
        self.threshold = threshold
        self.power = power

    def score(self, text: str):
        results = [s.score(text) for s in self.scorers]
        tokens, starts, ends = results[0][:3]
        n = len(tokens)

        def average_channels(channel_maps: list[dict]) -> dict:
            """{channel: map_pair} per scorer → thresholded points on the
            weighted-average map (sparse and dense inputs mix freely)."""
            acc_s: dict[int, np.ndarray] = {}
            acc_e: dict[int, np.ndarray] = {}
            for w, chmap in zip(self.weights, channel_maps):
                for ch, pair in chmap.items():
                    ds, de = _dense(pair, n, self.power)
                    acc_s.setdefault(ch, np.zeros(n))
                    acc_s[ch] += w * ds
                    acc_e.setdefault(ch, np.zeros(n))
                    acc_e[ch] += w * de
            out = {}
            for ch in acc_s:
                s_pts = np.nonzero(acc_s[ch] > self.threshold)[0]
                e_pts = np.nonzero(acc_e[ch] > self.threshold)[0]
                if s_pts.size or e_pts.size:
                    out[ch] = (s_pts, e_pts)
            return out

        sbj_channels = average_channels([r[3] for r in results])

        word_acc = np.zeros(n)
        for w, r in zip(self.weights, results):
            wm = np.asarray(r[4]).astype(float)
            word_acc += w * (wm if self.power == 1.0 else np.power(wm, self.power))
        word_mask = word_acc > self.threshold

        # object maps: weighted average per subject surface across models
        all_subjects = set()
        for r in results:
            all_subjects.update(r[5].keys())
        obj_map = {}
        for sbj in all_subjects:
            merged = average_channels([r[5].get(sbj, {}) for r in results])
            if merged:
                obj_map[sbj] = merged
        return tokens, starts, ends, sbj_channels, word_mask, obj_map

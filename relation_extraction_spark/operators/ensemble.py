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
    """(idx arrays | prob arrays) → (start_probs^power, end_probs^power).

    An empty array is a silent sparse channel regardless of dtype (np.asarray
    of an empty Python list is float64, which must NOT be routed to the
    dense branch)."""
    out = []
    for a in map_pair:
        a = np.asarray(a)
        if a.size == 0:
            d = np.zeros(n)
        elif a.dtype.kind == "f":
            if len(a) != n:
                raise ValueError(f"dense prob map has length {len(a)}, expected {n}")
            d = a.astype(float)
        else:  # sparse index set → 0/1 indicator
            d = np.zeros(n)
            d[a.astype(np.int64)] = 1.0
        out.append(d if power == 1.0 else np.power(d, power))
    return out[0], out[1]


class EnsembleScorer:
    """``combiner``: optional callable ``(stacked: np.ndarray[k, n]) →
    np.ndarray[n]`` merging the k models' probability maps for one channel
    side (reference model/combine.py:27-33 learns this merge as linear
    layers over concatenated per-model maps; its checkpoints are gone
    upstream, so the hook takes any per-channel merge — the default is the
    fixed-weight power average of main.py:744-762. Divergence note: the
    reference's learned combiner also mixes *across* channels; plug a
    closure over channel id if that is needed)."""

    def __init__(self, scorers: list, weights: list[float],
                 threshold: float = 0.5, power: float = 1.0,
                 combiner=None):
        assert len(scorers) == len(weights)
        self.scorers = scorers
        self.weights = weights
        self.threshold = threshold
        self.power = power
        self.combiner = combiner

    def _merge(self, stacked: np.ndarray) -> np.ndarray:
        if self.combiner is not None:
            return self.combiner(stacked)
        return np.asarray(self.weights) @ stacked

    def score(self, text: str):
        results = [s.score(text) for s in self.scorers]
        tokens, starts, ends = results[0][:3]
        n = len(tokens)

        k = len(self.scorers)

        def average_channels(channel_maps: list[dict]) -> dict:
            """{channel: map_pair} per scorer → thresholded points on the
            merged map (sparse and dense inputs mix freely; merge = weighted
            power average or the pluggable combiner)."""
            chans: set = set()
            for m in channel_maps:
                chans |= m.keys()
            out = {}
            for ch in chans:
                stack_s = np.zeros((k, n))
                stack_e = np.zeros((k, n))
                for m_i, chmap in enumerate(channel_maps):
                    pair = chmap.get(ch)
                    if pair is not None:
                        stack_s[m_i], stack_e[m_i] = _dense(pair, n, self.power)
                s_pts = np.nonzero(self._merge(stack_s) > self.threshold)[0]
                e_pts = np.nonzero(self._merge(stack_e) > self.threshold)[0]
                if s_pts.size or e_pts.size:
                    out[ch] = (s_pts, e_pts)
            return out

        sbj_channels = average_channels([r[3] for r in results])

        word_stack = np.zeros((k, n))
        for m_i, r in enumerate(results):
            wm = np.asarray(r[4]).astype(float)
            word_stack[m_i] = wm if self.power == 1.0 else np.power(wm, self.power)
        word_mask = self._merge(word_stack) > self.threshold

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

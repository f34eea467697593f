"""N10: weighted probability-ensemble of scorers (reference main.py:712-765).

The reference averages subject/word probability maps over k models with
weights, decodes subjects ONCE on the averaged maps, then averages the
per-model object maps conditioned on the shared subjects and decodes objects
once. With scorers that emit {0,1} pointer maps, weighted averaging reduces
to weighted voting: a point survives iff the summed weight of scorers firing
it exceeds the 0.5 threshold (model/hbt.py:16 point_threshold). This wrapper
preserves that exact dataflow — shared subject decode, shared object decode —
and plugs into the same fused extraction stage unchanged.
"""

from __future__ import annotations

import numpy as np


class EnsembleScorer:
    def __init__(self, scorers: list, weights: list[float], threshold: float = 0.5):
        assert len(scorers) == len(weights)
        self.scorers = scorers
        self.weights = weights
        self.threshold = threshold

    def score(self, text: str):
        results = [s.score(text) for s in self.scorers]
        tokens, starts, ends = results[0][:3]
        n = len(tokens)

        def vote_channels(channel_maps: list[dict]) -> dict:
            """{channel: (starts, ends)} per scorer → weighted-voted points."""
            acc_s: dict[int, np.ndarray] = {}
            acc_e: dict[int, np.ndarray] = {}
            for w, chmap in zip(self.weights, channel_maps):
                for ch, (s_idx, e_idx) in chmap.items():
                    a = acc_s.setdefault(ch, np.zeros(n))
                    a[np.asarray(s_idx, dtype=np.int64)] += w
                    b = acc_e.setdefault(ch, np.zeros(n))
                    b[np.asarray(e_idx, dtype=np.int64)] += w
            out = {}
            for ch in acc_s:
                s_pts = np.nonzero(acc_s[ch] > self.threshold)[0]
                e_pts = np.nonzero(acc_e[ch] > self.threshold)[0]
                if s_pts.size or e_pts.size:
                    out[ch] = (s_pts, e_pts)
            return out

        sbj_channels = vote_channels([r[3] for r in results])

        word_acc = np.zeros(n)
        for w, r in zip(self.weights, results):
            word_acc += w * r[4].astype(float)
        word_mask = word_acc > self.threshold

        # object maps: weighted vote per subject surface across models
        all_subjects = set()
        for r in results:
            all_subjects.update(r[5].keys())
        obj_map = {}
        for sbj in all_subjects:
            merged = vote_channels([r[5].get(sbj, {}) for r in results])
            if merged:
                obj_map[sbj] = merged
        return tokens, starts, ends, sbj_channels, word_mask, obj_map

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


class LinearCrossChannelCombiner:
    """Deterministic replica of the SHAPE of the reference's learned Combine
    head (model/combine.py:27-33): per token, the k models' start/end maps
    for ALL channels are concatenated into one vector x ∈ R^{k·C·2}
    (torch.cat over models of each model's (C·2)-row map block), passed
    through TWO linear layers with no activation between them
    (nn.Sequential(Linear, Linear)), and squashed with a sigmoid
    (model/combine.py:53-63); channel c's merged (start, end) probability
    rows are output pair 2c/2c+1. Because the weight matrices are dense over
    the concatenated vector, channel c's output can depend on every other
    channel of every model — the cross-channel mixing the per-channel
    ``combiner`` hook cannot express.

    The reference's trained checkpoints are deleted upstream (README.md:14),
    so exact parity is impossible; weights are INJECTED — tests use
    hand-built fixtures, and ``mean_fixture`` builds the degenerate
    "average over models" instance.

    Layout of x: index ``(m * C + c) * 2 + side`` (model-major, start=0)."""

    def __init__(self, channels: list[str], n_models: int,
                 w1: np.ndarray, b1: np.ndarray, w2: np.ndarray, b2: np.ndarray):
        self.channels = list(channels)
        self.n_models = n_models
        d_in = n_models * len(self.channels) * 2
        d_out = len(self.channels) * 2
        self.w1 = np.asarray(w1, dtype=float).reshape(d_in, d_in)
        self.b1 = np.asarray(b1, dtype=float).reshape(d_in)
        self.w2 = np.asarray(w2, dtype=float).reshape(d_out, d_in)
        self.b2 = np.asarray(b2, dtype=float).reshape(d_out)

    @classmethod
    def mean_fixture(cls, channels: list[str], n_models: int,
                     bias: float = -0.5) -> "LinearCrossChannelCombiner":
        """W1 = I, W2 = mean over models per (channel, side), b2 = bias:
        output = sigmoid(mean_models(p) + bias). With the default
        bias = -0.5, sigmoid(mean - 0.5) > 0.5 exactly when mean > 0.5 — the
        firing set is IDENTICAL to the unweighted-average path against the
        standard threshold, making this the true degenerate instance. A
        deterministic fixture exercising the full cross-channel plumbing
        with interpretable weights."""
        c = len(channels)
        d_in = n_models * c * 2
        w1 = np.eye(d_in)
        w2 = np.zeros((c * 2, d_in))
        for ci in range(c):
            for side in (0, 1):
                for m in range(n_models):
                    w2[ci * 2 + side, (m * c + ci) * 2 + side] = 1.0 / n_models
        return cls(channels, n_models, w1, np.zeros(d_in), w2,
                   np.full(c * 2, bias))

    def _index(self, model: int, channel_i: int, side: int) -> int:
        return (model * len(self.channels) + channel_i) * 2 + side

    def __call__(self, stacks: dict, n: int) -> dict:
        """stacks: {channel: (start_stack[k, n], end_stack[k, n])} — channels
        absent from the dict enter as zero maps (a model that emitted nothing
        for a channel is an all-zeros probability map, same convention as the
        weighted-average path). Returns {channel: (start_probs, end_probs)}
        for every constructed channel."""
        x = np.zeros((self.n_models * len(self.channels) * 2, n))
        for ci, ch in enumerate(self.channels):
            pair = stacks.get(ch)
            if pair is None:
                continue
            s, e = pair
            for m in range(self.n_models):
                x[self._index(m, ci, 0)] = s[m]
                x[self._index(m, ci, 1)] = e[m]
        y = self.w2 @ (self.w1 @ x + self.b1[:, None]) + self.b2[:, None]
        p = 1.0 / (1.0 + np.exp(-y))
        return {ch: (p[ci * 2], p[ci * 2 + 1])
                for ci, ch in enumerate(self.channels)}


class EnsembleScorer:
    """``combiner``: optional callable ``(stacked: np.ndarray[k, n]) →
    np.ndarray[n]`` merging the k models' probability maps for one channel
    side — the default is the fixed-weight power average of
    main.py:744-762.

    ``cross_combiner``: optional ``LinearCrossChannelCombiner``-shaped
    callable ``(stacks: {channel: (start[k,n], end[k,n])}, n) → {channel:
    (start_probs, end_probs)}`` replicating the reference's learned Combine
    head, which mixes across models AND channels (model/combine.py:27-33).
    Channels it does not know fall back to the per-channel merge."""

    def __init__(self, scorers: list, weights: list[float],
                 threshold: float = 0.5, power: float = 1.0,
                 combiner=None, cross_combiner=None):
        assert len(scorers) == len(weights)
        cc_models = getattr(cross_combiner, "n_models", None)
        if cc_models is not None and cc_models != len(scorers):
            # fail fast on the driver: a mismatch otherwise either silently
            # drops models (n_models < k) or IndexErrors inside mapInPandas
            raise ValueError(
                f"cross_combiner.n_models={cc_models} != {len(scorers)} scorers")
        self.scorers = scorers
        self.weights = weights
        self.threshold = threshold
        self.power = power
        self.combiner = combiner
        self.cross_combiner = cross_combiner

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
            power average, the pluggable per-channel combiner, or the
            cross-channel combiner for the channels it was built over)."""
            chans: set = set()
            for m in channel_maps:
                chans |= m.keys()
            stacks = {}
            for ch in chans:
                stack_s = np.zeros((k, n))
                stack_e = np.zeros((k, n))
                for m_i, chmap in enumerate(channel_maps):
                    pair = chmap.get(ch)
                    if pair is not None:
                        stack_s[m_i], stack_e[m_i] = _dense(pair, n, self.power)
                stacks[ch] = (stack_s, stack_e)
            crossed = {}
            if self.cross_combiner is not None:
                known = set(getattr(self.cross_combiner, "channels", ()))
                crossed = self.cross_combiner(
                    {c: p for c, p in stacks.items() if c in known}, n)
            out = {}
            for ch in chans | set(crossed):
                if ch in crossed:
                    s_probs, e_probs = crossed[ch]
                else:
                    s_probs = self._merge(stacks[ch][0])
                    e_probs = self._merge(stacks[ch][1])
                s_pts = np.nonzero(s_probs > self.threshold)[0]
                e_pts = np.nonzero(e_probs > self.threshold)[0]
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

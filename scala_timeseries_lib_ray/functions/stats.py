"""Uniform reservoir sampling (Vitter's Algorithm R) + snapshot statistics.

Reimplements the reference's ``stats/ThreadUnsafeDoubleUniformReservoir.scala:26-79``
(update rule: fill the first ``size`` values, then replace slot ``r`` when
``r = rand(0, count) < size``; true min/max tracked exactly) and the snapshot math of
``UniformDoubleSnapshot`` (``:87-148``): mean over the sample, sample std with
``n-1`` divisor, and the interpolated ``pos = q*(n+1)`` quantile. RNG is a seeded
``numpy`` generator (deterministic per partition; the reference uses
ThreadLocalRandom so only the distribution, not the draw sequence, is parity).

Reservoirs are mergeable for manifest folding: a weighted merge draws each slot from
either side with probability proportional to the source counts.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEFAULT_SIZE = 1028


@dataclass
class Stats:
    min: float
    max: float
    mean: float
    std_dev: float
    median: float

    @classmethod
    def zero(cls) -> "Stats":
        return cls(0.0, 0.0, 0.0, 0.0, 0.0)

    def as_dict(self) -> dict:
        return {
            "min": self.min,
            "max": self.max,
            "mean": self.mean,
            "std_dev": self.std_dev,
            "median": self.median,
        }


def compute_stats(sample: np.ndarray, mn: float, mx: float) -> Stats:
    s = np.sort(np.asarray(sample, dtype=np.float64))
    n = len(s)
    if n == 0:
        return Stats.zero()
    avg = float(s.mean())
    std = float(np.sqrt(((s - avg) ** 2).sum() / (n - 1))) if n > 1 else 0.0
    # interpolated quantile, pos = q*(n+1) (UniformDoubleSnapshot.getValue)
    pos = 0.5 * (n + 1)
    idx = int(pos)
    if idx < 1:
        med = float(s[0])
    elif idx >= n:
        med = float(s[-1])
    else:
        med = float(s[idx - 1] + (pos - np.floor(pos)) * (s[idx] - s[idx - 1]))
    return Stats(mn, mx, avg, std, med)


class UniformReservoir:
    def __init__(self, size: int = DEFAULT_SIZE, seed: int = 0):
        self.size = size
        self.values = np.zeros(size, dtype=np.float64)
        self.count = 0
        self.min = np.inf
        self.max = -np.inf
        self.rng = np.random.default_rng(seed)

    def update_many(self, vals: np.ndarray) -> "UniformReservoir":
        """Vectorized Algorithm R over a batch (fill phase vectorized; replacement
        draws are per-element, matching the sequential acceptance probabilities)."""
        vals = np.asarray(vals, dtype=np.float64)
        if len(vals) == 0:
            return self
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        i = 0
        if self.count < self.size:
            take = min(self.size - self.count, len(vals))
            self.values[self.count : self.count + take] = vals[:take]
            self.count += take
            i = take
        rest = vals[i:]
        if len(rest):
            counts = self.count + np.arange(len(rest), dtype=np.int64)
            draws = (self.rng.random(len(rest)) * counts).astype(np.int64)
            hit = draws < self.size
            # sequential replacement: later hits overwrite earlier ones per slot
            for slot, v in zip(draws[hit], rest[hit]):
                self.values[slot] = v
            self.count += len(rest)
        return self

    def merge(self, other: "UniformReservoir") -> "UniformReservoir":
        """Standard without-replacement reservoir merge (ADVICE r01): the number
        of output slots drawn from self follows a hypergeometric law on the
        underlying stream counts, and each side contributes DISTINCT indices —
        no duplicate slots, so repeated tree merges stay (approximately) uniform
        without compounding variance."""
        if other.count == 0:
            return self
        if self.count == 0:
            self.values = other.values.copy()
            self.count = other.count
            self.min, self.max = other.min, other.max
            return self
        n_a, n_b = min(self.count, self.size), min(other.count, other.size)
        out_n = min(self.size, n_a + n_b)
        k_a = int(self.rng.hypergeometric(self.count, other.count, out_n))
        k_a = min(max(k_a, out_n - n_b), n_a)  # clip to available slots per side
        ia = self.rng.choice(n_a, size=k_a, replace=False)
        ib = self.rng.choice(n_b, size=out_n - k_a, replace=False)
        merged = np.concatenate([self.values[ia], other.values[:n_b][ib]])
        self.rng.shuffle(merged)  # slot order must not encode the source side
        self.values[:out_n] = merged
        self.count = self.count + other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        return self

    def snapshot(self) -> Stats:
        if self.count == 0:
            return Stats.zero()
        n = min(self.count, self.size)
        return compute_stats(self.values[:n], self.min, self.max)

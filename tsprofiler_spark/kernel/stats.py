"""TSStats and chunk statistics.

Replicates the reference's chunk statistics (discretizer.computeStats,
reference: profiler/discretizer/descretizer.go:68-85) and the running
global-stats merge (reference: profiler/counter/counter.go:148-156).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace

import numpy as np


@dataclass
class TSStats:
    """Statistics of a chunk or a running global (models/tsstats.go:4-11)."""

    min: float = 0.0
    max: float = 0.0
    stddev: float = 0.0
    avg: float = 0.0
    count: int = 0
    stddev_sum: float = 0.0

    def to_json_dict(self) -> dict:
        return {
            "min": self.min,
            "max": self.max,
            "stddev": self.stddev,
            "avg": self.avg,
            "count": self.count,
            "stddevsum": self.stddev_sum,
        }

    def copy(self) -> "TSStats":
        return replace(self)


def sample_stddev(data: np.ndarray) -> float:
    """gonum's stat.StdDev: sample stddev with n-1 denominator.

    Returns NaN for n < 2, matching gonum.
    """
    n = len(data)
    if n < 2:
        return float("nan")
    mean = float(np.mean(data))
    var = float(np.sum((np.asarray(data, dtype=np.float64) - mean) ** 2)) / (n - 1)
    return math.sqrt(var)


def compute_chunk_stats(
    raw: np.ndarray,
    chunk_min: float,
    chunk_max: float,
    current_avg: float,
    fix_bound: bool,
    fixed_min: float,
    fixed_max: float,
) -> TSStats:
    """Per-chunk stats (reference: descretizer.go:68-85).

    ``current_avg`` is the *global running average before this chunk*;
    ``stddev_sum = sum((v - current_avg) * (v - chunk_avg))``.
    """
    raw = np.asarray(raw, dtype=np.float64)
    avg = float(np.mean(raw))
    stats = TSStats(
        min=fixed_min if fix_bound else chunk_min,
        max=fixed_max if fix_bound else chunk_max,
        avg=avg,
        count=len(raw),
        stddev=sample_stddev(raw),
        stddev_sum=float(np.sum((raw - current_avg) * (raw - avg))),
    )
    return stats


def weighted_mean(values: list[float], weights: list[float]) -> float:
    """gonum stat.Mean with weights: sum(v*w)/sum(w)."""
    sw = 0.0
    swv = 0.0
    for v, w in zip(values, weights):
        sw += w
        swv += v * w
    return swv / sw


def merge_global_stats(global_stats: TSStats, chunk: TSStats) -> TSStats:
    """Running global merge (reference: counter.go:148-156).

    Weighted 2-way mean fold in chunk arrival order; population-style
    stddev over the accumulated cross-term sum.
    """
    out = global_stats.copy()
    old_avg = out.avg
    out.avg = weighted_mean([old_avg, chunk.avg], [float(out.count), float(chunk.count)])
    out.count += chunk.count
    out.stddev_sum += chunk.stddev_sum
    out.stddev = go_sqrt(out.stddev_sum / float(out.count))
    return out


def go_sqrt(x: float) -> float:
    """math.Sqrt parity: negative input yields NaN instead of raising."""
    if x < 0 or math.isnan(x):
        return float("nan")
    return math.sqrt(x)

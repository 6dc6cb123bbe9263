"""Loss bookkeeping: per-term breakdown, bias-corrected EMA, bounded history.

Host-side mirrors of the reference's structures (training.jl:16-183):

  - LossBreakdown: the 8 weighted terms + total (terms sum to total by
    construction — they are recorded from inside the loss closure);
  - LossLog: bias-corrected EMA with horizon 200 (each step scores a
    different view, so the raw curve is mostly view-difficulty noise);
  - LossHistory: bounded full-run curves via interval-doubling thinning
    (capacity 512), with versioned snapshots for a UI thread.
"""
from __future__ import annotations

from dataclasses import dataclass, field

LOSS_TERMS = ("total", "l1", "ssim", "reg", "tv", "depth", "sky", "flatten", "normal")
EMA_HORIZON = 200
HISTORY_CAPACITY = 512


@dataclass
class LossLog:
    """Bias-corrected EMA over a ~`horizon`-step window (training.jl:122-148)."""

    horizon: int = EMA_HORIZON
    _ema: float = 0.0
    _weight: float = 0.0

    @property
    def beta(self) -> float:
        return 1.0 - 1.0 / self.horizon

    def record(self, value: float) -> None:
        self._ema = self.beta * self._ema + (1.0 - self.beta) * value
        self._weight = self.beta * self._weight + (1.0 - self.beta)

    @property
    def smoothed(self) -> float:
        return self._ema / self._weight if self._weight > 0 else 0.0


@dataclass
class LossHistory:
    """Bounded per-term curves: when full, every other sample is dropped and
    the sampling interval doubles (training.jl:61-120). Snapshots are
    versioned copies, safe to hand to another thread."""

    capacity: int = HISTORY_CAPACITY
    interval: int = 1
    version: int = 0
    steps: list = field(default_factory=list)
    curves: dict = field(default_factory=lambda: {k: [] for k in LOSS_TERMS})
    _count: int = 0

    def record(self, step: int, terms: dict) -> None:
        self._count += 1
        if (self._count - 1) % self.interval != 0:
            return
        if len(self.steps) >= self.capacity:
            self.steps = self.steps[::2]
            for k in self.curves:
                self.curves[k] = self.curves[k][::2]
            self.interval *= 2
            if (self._count - 1) % self.interval != 0:
                return
        self.steps.append(step)
        for k in LOSS_TERMS:
            self.curves[k].append(float(terms.get(k, 0.0)))
        self.version += 1

    def snapshot(self) -> dict:
        return {
            "version": self.version,
            "interval": self.interval,
            "steps": list(self.steps),
            "curves": {k: list(v) for k, v in self.curves.items()},
        }


class LossTracker:
    """EMA per term + bounded history; what the Trainer records each step."""

    def __init__(self):
        self.ema = {k: LossLog() for k in LOSS_TERMS}
        self.history = LossHistory()

    def record(self, step: int, terms: dict) -> None:
        for k in LOSS_TERMS:
            if k in terms:
                self.ema[k].record(float(terms[k]))
        self.history.record(step, terms)

    def smoothed(self) -> dict:
        return {k: v.smoothed for k, v in self.ema.items()}

    def breakdown_line(self) -> str:
        s = self.smoothed()
        parts = " ".join(
            f"{k}={s[k]:.5f}" for k in LOSS_TERMS if k == "total" or abs(s[k]) > 0
        )
        return parts

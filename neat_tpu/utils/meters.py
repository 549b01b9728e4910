"""Running-mean meters for the loss dict (reference volsdf_train.py:49-64)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import numpy as np


class AverageMeter:
    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    def push(self, values: Dict[str, float]) -> None:
        for k, v in values.items():
            self._sums[k] += float(np.asarray(v))
            self._counts[k] += 1

    def __call__(self) -> Dict[str, float]:
        return {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()

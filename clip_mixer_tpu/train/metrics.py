"""Thin metrics writer: TensorBoard when available, always an in-memory log.

The reference logs Loss / Learning rate / Gradient norm plus validator
scalars to a rank-0 SummaryWriter (training.py:98-100,183,188-190). Same
scalar names here; tensorboardX is optional (offline/test environments run
without it).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple


class MetricsWriter:
    def __init__(self, log_dir: Optional[str] = None, enabled: bool = True):
        self.history: Dict[str, List[Tuple[int, float]]] = defaultdict(list)
        self._tb = None
        if enabled and log_dir is not None:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except ImportError:
                pass

    def add_scalar(self, name: str, value: float, step: int) -> None:
        self.history[name].append((int(step), float(value)))
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)

    def add_figure(self, name: str, figure, step: int) -> None:
        self.history[f"{name}:figure"].append((int(step), 1.0))
        if self._tb is not None:
            self._tb.add_figure(name, figure, step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()

"""Thin metrics writer: TensorBoard when available, always an in-memory log,
and a plain-text JSONL sink for scripting.

The reference logs Loss / Learning rate / Gradient norm plus validator
scalars to a rank-0 SummaryWriter (training.py:98-100,183,188-190). Same
scalar names here; tensorboardX is optional (offline/test environments run
without it). ``{log_dir}/metrics.jsonl`` gets every scalar as
``{"step": s, "name": n, "value": v}`` regardless — greppable/plottable
without the TB toolchain, appended at flush() cadence so the step path
never touches disk.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


class MetricsWriter:
    def __init__(self, log_dir: Optional[str] = None, enabled: bool = True):
        self.history: Dict[str, List[Tuple[int, float]]] = defaultdict(list)
        self._tb = None
        self._jsonl_path = None
        self._remote = log_dir is not None and "://" in log_dir
        self._jsonl_buf: List[str] = []
        self._all_rows: List[str] = []  # full file image for remote rewrites
        if enabled and log_dir is not None:
            if self._remote:
                # gs://... run dirs: os.makedirs/open would silently create a
                # LOCAL "./gs:/..." directory. Object stores can't append, so
                # flush() rewrites the (small) whole file through epath.
                from etils import epath

                p = epath.Path(log_dir)
                p.mkdir(parents=True, exist_ok=True)
                self._jsonl_path = p / "metrics.jsonl"
            else:
                os.makedirs(log_dir, exist_ok=True)
                self._jsonl_path = os.path.join(log_dir, "metrics.jsonl")
                # TB events only for local dirs: without the tf stack,
                # tensorboardX would "write" gs://... via os.makedirs and
                # silently land events in a local ./gs:/ directory.
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(log_dir=log_dir)
                except ImportError:
                    pass

    def add_scalar(self, name: str, value: float, step: int) -> None:
        self.history[name].append((int(step), float(value)))
        if self._jsonl_path is not None:
            self._jsonl_buf.append(
                json.dumps({"step": int(step), "name": name, "value": float(value)})
            )
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)

    def add_figure(self, name: str, figure, step: int) -> None:
        self.history[f"{name}:figure"].append((int(step), 1.0))
        if self._tb is not None:
            self._tb.add_figure(name, figure, step)

    def flush(self) -> None:
        if self._jsonl_path is not None and self._jsonl_buf:
            self._all_rows.extend(self._jsonl_buf)
            if self._remote:
                self._jsonl_path.write_text("\n".join(self._all_rows) + "\n")
            else:
                with open(self._jsonl_path, "a") as f:
                    f.write("\n".join(self._jsonl_buf) + "\n")
            self._jsonl_buf = []
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()

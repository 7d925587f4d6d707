"""Append-only JSONL metrics logging (ref ``train.py:66-70`` and the JSONL
record phases 'train_batch'/'probe'/'epoch_end'/'ddim_step' described in
SURVEY.md §5.5)."""
from __future__ import annotations

import json
import os
from typing import Optional


class JsonlLogger:
    """Tiny append-only JSONL writer; a no-op when path is falsy."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            parent = os.path.dirname(path)
            if parent:
                os.makedirs(parent, exist_ok=True)

    def log(self, obj: dict) -> None:
        if not self.path:
            return
        with open(self.path, "a") as fh:
            fh.write(json.dumps(obj, default=_to_jsonable) + "\n")

    __call__ = log


def _to_jsonable(x):
    try:
        import numpy as np

        if isinstance(x, (np.integer,)):
            return int(x)
        if isinstance(x, (np.floating,)):
            return float(x)
        if isinstance(x, np.ndarray):
            return x.tolist()
    except Exception:
        pass
    return str(x)

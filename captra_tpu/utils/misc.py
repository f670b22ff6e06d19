"""Shared small utilities (reference /root/reference/utils.py)."""
from __future__ import annotations

import time


def add_dict(total: dict, new: dict) -> None:
    """Accumulate (possibly nested) numeric dicts in place (reference
    add_dict, utils.py:46-66)."""
    for k, v in new.items():
        if isinstance(v, dict):
            total.setdefault(k, {})
            add_dict(total[k], v)
        else:
            total[k] = total.get(k, 0.0) + float(v)


def divide_dict(d: dict, cnt: int) -> dict:
    """Element-wise divide a nested dict (reference divide_dict,
    utils.py:69-76)."""
    return {k: (divide_dict(v, cnt) if isinstance(v, dict) else v / cnt)
            for k, v in d.items()}


def log_loss_summary(loss_dict: dict, cnt: int, log_fn) -> None:
    """Flatten + average + emit (reference log_loss_summary,
    utils.py:88-107)."""
    def walk(prefix, d):
        for k, v in sorted(d.items()):
            name = f"{prefix}_{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(name, v)
            else:
                log_fn(name, v / cnt)

    walk("", loss_dict)


class Timer:
    """Wall-clock tick timer (reference Timer, utils.py:139-152)."""

    def __init__(self, on: bool = True):
        self.on = on
        if on:
            self.last = time.perf_counter()

    def tick(self, tag: str | None = None) -> float:
        if not self.on:
            return 0.0
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        if tag:
            print(f"[timer] {tag}: {dt * 1e3:.2f} ms")
        return dt


def get_ith_from_batch(data, i: int, to_single: bool = True):
    """Extract element i from a batched nested structure (reference
    get_ith_from_batch, utils.py:155-172)."""
    import numpy as np
    if isinstance(data, dict):
        return {k: get_ith_from_batch(v, i, to_single) for k, v in
                data.items()}
    if isinstance(data, (list, tuple)):
        return [get_ith_from_batch(v, i, to_single) for v in data]
    arr = np.asarray(data)
    if arr.ndim == 0:
        return arr.item() if to_single else arr
    out = arr[i]
    if to_single and out.ndim == 0:
        return out.item()
    return out

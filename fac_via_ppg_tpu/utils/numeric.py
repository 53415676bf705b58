"""Small shared numeric helpers."""

from __future__ import annotations


def round_up(n: int, multiple: int) -> int:
    """Round n up to a multiple (shape-bucketing helper)."""
    if multiple <= 1:
        return n
    return ((n + multiple - 1) // multiple) * multiple

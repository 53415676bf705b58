"""Small shared numeric helpers."""

from __future__ import annotations


def round_up(n: int, multiple: int) -> int:
    """Round n up to a multiple (shape-bucketing helper)."""
    if multiple <= 1:
        return n
    return ((n + multiple - 1) // multiple) * multiple


def round_batch_to_grid(b: int, multiple: int = 8) -> int:
    """Round a serving batch size up to the TPU tile grid.

    A batch axis that is >8 but off the 8-grid retiles the (B, ., G)
    serving tensors so badly that the program produces LESS audio per
    second than the next grid point in ABSOLUTE terms (measured: the
    vocoder at b=12 runs 213.8x RT vs 325x at b=8 and 338x at b=16 —
    docs/PERF.md serving frontier), so padding 12 real rows into a
    16-row program is a pure win.  Batches <= `multiple` are returned
    unchanged: small programs don't exhibit the crater and padding them
    only adds compute.
    """
    if b <= multiple or b % multiple == 0:
        return b
    return round_up(b, multiple)

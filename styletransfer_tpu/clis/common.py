"""Shared CLI option parsing (no sibling imports — safe for clis/__init__)."""

from typing import List, Optional

import click


def parse_sizes_option(sizes: Optional[str]) -> Optional[List[int]]:
    """``--sizes "S1,S2,..."`` -> int list (or None when unset).

    One parser for the three bucketed serve commands (`fast_st serve`,
    `serve-multi`, `video_st serve`); the engine-side validation lives in
    ``engines.daemon.normalize_buckets``.
    """
    if not sizes:
        return None
    try:
        out = [int(s) for s in sizes.split(",") if s.strip()]
    except ValueError:
        raise click.UsageError(
            f"--sizes must be a comma list of ints, got {sizes!r}"
        )
    if not out:
        raise click.UsageError("--sizes is empty")
    return out

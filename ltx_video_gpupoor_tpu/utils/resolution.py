"""Resolution bucketing for bounded XLA compile caches.

On TPU, every distinct (height, width, frames) triple compiles a new
program. The reference carries SDXL-style aspect-ratio bin tables for the
same idea (``/root/reference/ltx_video/pipelines/pipeline_ltx_video.py:
51-121``, ``ASPECT_RATIO_{512,1024}_BIN``); here the bins are *generated*
from the rule those tables encode — for each aspect ratio, the (h, w)
pair on a 32-pixel grid whose area is as close as possible to (but not
above) ``base**2`` — so any base resolution gets a table, and snapping is
one dict lookup away from a bounded jit-cache footprint.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def aspect_ratio_bins(
    base: int = 512,
    block: int = 32,
    min_side: int | None = None,
    max_side: int | None = None,
) -> dict[float, tuple[int, int]]:
    """Map aspect ratio -> (height, width) on the ``block`` grid with area
    maximal under ``base**2``. Covers ratios from 1:4 to 4:1."""
    if min_side is None:
        min_side = base // 2
    if max_side is None:
        max_side = base * 2
    budget = base * base
    bins: dict[float, tuple[int, int]] = {}
    h = min_side
    while h <= max_side:
        # widest width within the area budget, on the grid
        w = (budget // h) // block * block
        if min_side <= w <= max_side:
            ratio = round(h / w, 2)
            cand = (h, w)
            if ratio not in bins or cand[0] * cand[1] > bins[ratio][0] * bins[ratio][1]:
                bins[ratio] = cand
        h += block
    return dict(sorted(bins.items()))


def snap_to_bin(
    height: int,
    width: int,
    base: int = 512,
    block: int = 32,
) -> tuple[int, int]:
    """Snap (height, width) to the generated bin with the nearest aspect
    ratio — the bucketing policy that keeps the number of compiled
    programs bounded by the bin count regardless of user-supplied sizes."""
    bins = aspect_ratio_bins(base, block)
    ratio = height / width
    best = min(bins, key=lambda r: abs(r - ratio))
    return bins[best]


def bucketed_dimensions(
    height: int,
    width: int,
    frame_num: int,
    base: int | None = None,
) -> tuple[int, int, int]:
    """Full bucketing: snap H/W to the aspect bin of the nearest base
    (chosen by area when ``base`` is None), frames UP to the next point
    of the 8k+1 grid the causal VAE requires — padding up matches the
    reference (``((f-2)//8+1)*8+1``) and never silently shortens the
    requested clip (callers should surface the result when it differs
    from the request — see ``serving/orchestrator.py``)."""
    if base is None:
        area = height * width
        base = min((512, 768, 1024), key=lambda b: abs(b * b - area))
    h, w = snap_to_bin(height, width, base=base)
    f = max(frame_num, 1)
    frames = ((f - 2) // 8 + 1) * 8 + 1
    return h, w, frames

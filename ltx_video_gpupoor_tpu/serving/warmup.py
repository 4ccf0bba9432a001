"""Serving warmup: pre-compile the hot programs for known shapes.

Cold serving previously paid minutes of XLA compilation on the first
request (denoise scan, upsampler, tiled VAE decode, uint8 quantize).
Together with the persistent compilation cache
(``core/compile_cache.py``) this module amortizes that: at startup the
server runs one tiny-step generation per configured resolution bucket in
a background thread, so every program is compiled (first process) or
deserialized from the on-disk cache (every later process) before the
first real request lands.

Env:
- ``LTXV_TPU_WARMUP``: comma-separated ``WxHxF`` buckets, ``default`` for
  the standard serving shape, or ``off`` (default: ``default``).
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_BUCKET = (704, 480, 121)


def warmup_shapes(generator, buckets=None, i2v: bool = True,
                  lock: threading.Lock | None = None,
                  output_type: str | None = None) -> float:
    """Compile the serving programs for each ``(W, H, F)`` bucket by
    running a 1-step generation (compile time dominates; the single step
    is negligible). Returns elapsed seconds.

    ``output_type``: defaults to what the LIVE server path will request
    (``yuv420`` when the native codec is available, else ``pixels`` —
    mirrors ``server.py``); warming a different one would compile the
    uint8-RGB quantize program the server never runs and leave the first
    real request paying the ``_rgb_to_yuv420`` compile.

    ``lock``: the server's generation lock — held per bucket so warmup
    never runs concurrently with a live request (two full-res
    generations' HBM do not fit one chip); a request arriving mid-bucket
    waits for that bucket, not the whole warmup."""
    import jax
    import jax.numpy as jnp

    if output_type is None:
        from ..utils import native_codec

        output_type = "yuv420" if native_codec.available() else "pixels"
    buckets = list(buckets or [DEFAULT_BUCKET])
    t0 = time.time()
    pipe = generator.pipeline
    cap = pipe.transformer_cfg.caption_channels
    # compile for the text length the LIVE path will use: the real T5
    # encode pads to 256 (encode_prompt default), the demo hash
    # embeddings use 128 — warming the wrong one leaves the first real
    # request paying the full compile anyway
    text_len = 256 if pipe.t5_params is not None else 128
    emb = jnp.zeros((2, text_len, cap), jnp.bfloat16)
    mask = jnp.ones((2, text_len), jnp.int32)
    ctx = lock if lock is not None else contextlib.nullcontext()
    for w, h, f in buckets:
        img = None
        if i2v:
            img = np.zeros((h, w, 3), np.uint8)
        try:
            with ctx:
                generator.generate(
                    emb, mask, height=h, width=w, frame_num=f,
                    image_start=img, sampling_steps=1, seed=0,
                    output_type=output_type,
                )
            logger.info("warmup %dx%dx%df done (%.1f s elapsed)",
                        w, h, f, time.time() - t0)
        except Exception as e:  # warmup must never take the server down
            logger.warning("warmup %dx%dx%df failed: %s", w, h, f, e)
    return time.time() - t0


def parse_buckets(spec: str):
    """``"704x480x121,512x512x57"`` -> [(704, 480, 121), (512, 512, 57)];
    ``"default"`` -> [DEFAULT_BUCKET]; ``"off"``/empty -> []."""
    spec = (spec or "").strip().lower()
    if not spec or spec in ("off", "0", "false", "none"):
        return []
    out = []
    for part in spec.split(","):
        part = part.strip()
        if part == "default":
            out.append(DEFAULT_BUCKET)
            continue
        w, h, f = (int(x) for x in part.split("x"))
        out.append((w, h, f))
    return out


def start_background_warmup(
    generator, spec: str | None = None,
    lock: threading.Lock | None = None,
) -> threading.Thread | None:
    """Kick off warmup per ``spec`` (default: ``LTXV_TPU_WARMUP`` env)
    without blocking startup."""
    if spec is None:
        spec = os.environ.get("LTXV_TPU_WARMUP", "default")
    buckets = parse_buckets(spec)
    if not buckets:
        return None
    th = threading.Thread(
        target=warmup_shapes, args=(generator, buckets),
        kwargs={"lock": lock}, name="ltxv-warmup", daemon=True,
    )
    th.start()
    return th

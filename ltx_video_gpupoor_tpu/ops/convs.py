"""Shared conv formulations.

``framewise_conv_sum`` expresses a temporal-stride-1 3-D conv whose
input is already padded in TIME as ``kt`` temporally shifted framewise
NHWC 2-D convs accumulated in fp32. Identical math to the NDHWC 3-D
conv — bit-equal in fp32; bf16 outputs differ by summation-order ulps
(``tools/mb_conv3d.py``) — but XLA:TPU tiles batched 2-D convs onto the
MXU better than 3-D convs: measured on v5e, LTX 704x480x121f decode
0.49 s → 0.33 s and Wan 832x480x81f tiled decode 8.0 s → 5.68 s
(perf_logs/r3d, r3e). Restricted to ODD temporal kernels: for even kt
the two formulations emit different frame counts under causal padding
(callers fall back to the 3-D conv there).

Used by both VAE families (``models/ltx/vae.py``, ``models/wan/vae.py``
— the reference's CausalConv3d modules, ``/root/reference/ltx_video/
models/autoencoders/causal_conv3d.py`` and ``/root/reference/wan/
modules/vae.py:17-38``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def framewise_conv_sum(
    x: jax.Array,                  # [B, F_padded, H, W, Cin], time-prepadded
    kernel: jax.Array,             # [kt, kh, kw, Cin, Cout]
    spatial_padding,               # "SAME"/"VALID" or [(ph,ph),(pw,pw)]
    spatial_strides: tuple[int, int] = (1, 1),
) -> jax.Array:
    """Temporal-VALID conv over a time-prepadded input, one framewise
    2-D conv per temporal tap, fp32 accumulation. Returns
    [B, F_padded-kt+1, H', W', Cout] in ``x.dtype``."""
    kt = kernel.shape[0]
    if kt % 2 == 0:
        raise ValueError("framewise_conv_sum requires odd kt; even "
                         "temporal kernels need the 3-D formulation")
    b = x.shape[0]
    f_out = x.shape[1] - (kt - 1)
    k = kernel.astype(x.dtype)
    acc = None
    for dt in range(kt):
        flat = x[:, dt:dt + f_out].reshape((b * f_out,) + x.shape[2:])
        y = jax.lax.conv_general_dilated(
            flat, k[dt], spatial_strides, spatial_padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    return acc.astype(x.dtype).reshape((b, f_out) + acc.shape[1:])

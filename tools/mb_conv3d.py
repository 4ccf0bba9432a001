"""Probe: is XLA's 3-D conv lowering the Wan-VAE decode bottleneck?

The decode measures ~8 s at an analytically-estimated ~19% MFU. The
decoder is dominated by 3x3x3 causal convs (models/wan/vae.py::
causal_conv3d). Hypothesis: TPU XLA maps NHWC 2-D convs well but 3-D
convs poorly, so the same math expressed as a sum of kt temporally
shifted framewise 2-D convs (identical FLOPs) may run much faster.

Real TPU: python tools/mb_conv3d.py
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np


def conv3d(x, k):
    kt, kh, kw = k.shape[:3]
    pads = [(0, 0), (2 * (kt // 2), 0), (kh // 2, kh // 2),
            (kw // 2, kw // 2), (0, 0)]
    x = jnp.pad(x, pads)
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv3d_as_2d(x, k):
    """Same causal 3x3x3 conv as kt framewise 2-D convs, summed."""
    kt = k.shape[0]
    b, f = x.shape[:2]
    xp = jnp.pad(x, [(0, 0), (2 * (kt // 2), 0), (0, 0), (0, 0), (0, 0)])
    acc = None
    for dt in range(kt):
        flat = xp[:, dt:dt + f].reshape((b * f,) + x.shape[2:])
        y = jax.lax.conv_general_dilated(
            flat, k[dt].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    return acc.astype(x.dtype).reshape((b, f) + acc.shape[1:])


def bench(fn, x, k, iters=3):
    f = jax.jit(fn)
    y = f(x, k)
    float(np.asarray(y[(0,) * y.ndim]))  # compile + sync
    t0 = time.time()
    for _ in range(iters):
        y = f(x, k)
    float(np.asarray(y[(0,) * y.ndim]))
    return (time.time() - t0) / iters


SHAPES = [
    # (label, F, H, W, Cin, Cout) — decoder scales at the 832x480x81f
    # serving shape, 256 px spatial tiles
    ("full-res C96", 81, 256, 256, 96, 96),
    ("half-res C192", 81, 128, 208, 192, 192),
    ("latent-res C384", 21, 60, 104, 384, 384),
]


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for label, f, h, w, cin, cout in SHAPES:
        key = jax.random.key(0)
        x = jax.random.normal(key, (1, f, h, w, cin), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16)
        flops = 2 * 27 * cin * cout * f * h * w
        t3 = bench(conv3d, x, k)
        t2 = bench(conv3d_as_2d, x, k)
        # numerics check at a tiny shape with the same code path
        xs = x[:, :5, :64, :64]
        d = float(jnp.max(jnp.abs(
            conv3d(xs, k).astype(jnp.float32)
            - conv3d_as_2d(xs, k).astype(jnp.float32))))
        print(f"{label:16s} conv3d {t3*1e3:7.1f} ms ({flops/t3/1e12:5.1f} "
              f"TF/s) | as-2d {t2*1e3:7.1f} ms ({flops/t2/1e12:5.1f} TF/s)"
              f" | max|diff| {d:.3e}", flush=True)


if __name__ == "__main__":
    main()

"""Probe: Wan tiled VAE decode, fused-jit vs eager tile loop.

832x480x81f serving shape (latents [1, 21, 60, 104, 16]), 256 px tiles.
Real TPU:  python tools/mb_wan_decode.py [fused|eager|untiled]
"""
import sys, time

sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np

from ltx_video_gpupoor_tpu.models.wan import vae as wan_vae

case = sys.argv[1] if len(sys.argv) > 1 else "fused"

cfg = wan_vae.WanVAEConfig()
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    wan_vae.init_params(jax.random.key(0), cfg),
)
z = jax.random.normal(jax.random.key(1), (1, 21, 60, 104, 16),
                      jnp.bfloat16)

if case == "fused":
    fn = lambda: wan_vae.spatial_tiled_decode_fused(
        params, cfg, z, tile_size=256)
elif case == "eager":
    fn = lambda: wan_vae.spatial_tiled_decode(params, cfg, z,
                                              tile_size=256)
else:
    fn = lambda: wan_vae._tile_decode(params, cfg, z)


def run():
    out = fn()
    np.asarray(out[(0,) * out.ndim])  # scalar sync


t0 = time.time(); run(); cold = time.time() - t0
t0 = time.time(); run(); warm = time.time() - t0
print(f"wan tiled decode[{case}]: warm {warm:.2f} s (first {cold:.1f} s)",
      flush=True)

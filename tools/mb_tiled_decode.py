"""Probe: where does the ~90 s warm pass2/vae_decode go?

Times the 896x640x121f tiled decode standalone (the pass-2 serving
shape): case `plain` = timestep=None, case `cond` = timestep
conditioning + noise key (the serving config). One case per process so
the shared relay chip doesn't accumulate both cases' buffers. Real TPU:

    python tools/mb_tiled_decode.py plain|cond [z_tile hw_tile]
"""
import sys, time

sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np

from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
from ltx_video_gpupoor_tpu.models.ltx.vae_tiling import tiled_decode

case = sys.argv[1] if len(sys.argv) > 1 else "cond"
z_tile = int(sys.argv[2]) if len(sys.argv) > 2 else 4
hw_tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512

cfg = ltx_vae.VAEConfig.from_dict(ltx_vae.LTX_VAE_CONFIG_097)
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    ltx_vae.init_params(jax.random.key(0), cfg),
)
# pass-2 latent shape for 896x640x121f
z = jax.random.normal(jax.random.key(1), (1, 16, 80, 112, 128),
                      jnp.bfloat16)

kw = {}
if case == "cond":
    kw = dict(timestep=jnp.asarray(0.05), noise_key=jax.random.key(3))


def run():
    out = tiled_decode(params, cfg, z, z_tile=z_tile, hw_tile=hw_tile, **kw)
    np.asarray(out[0, 0, 0, 0, 0])  # force


t0 = time.time(); run(); cold = time.time() - t0
t0 = time.time(); run(); warm = time.time() - t0
print(f"tiled_decode[{case}] z_tile={z_tile} hw_tile={hw_tile}: "
      f"warm {warm:.2f} s (first {cold:.1f} s)", flush=True)

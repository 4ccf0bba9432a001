"""Probe: where does the 86 s warm pass2/vae_decode go?

Times the 896x640x121f tiled decode standalone: (a) timestep=None,
(b) with timestep conditioning + noise key (the serving config), and
(c) the pipeline.decode wrapper end-to-end. Real TPU.
"""
import sys, time

sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np

from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
from ltx_video_gpupoor_tpu.models.ltx.vae_tiling import tiled_decode

cfg = ltx_vae.VAEConfig.from_dict(ltx_vae.LTX_VAE_CONFIG_097)
params = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    ltx_vae.init_params(jax.random.key(0), cfg),
)
# pass-2 latent shape for 896x640x121f
z = jax.random.normal(jax.random.key(1), (1, 16, 80, 112, 128),
                      jnp.bfloat16)


def timeit(name, fn):
    t0 = time.time(); np.asarray(fn()[0, 0, 0, 0, 0]); cold = time.time() - t0
    t0 = time.time(); np.asarray(fn()[0, 0, 0, 0, 0]); warm = time.time() - t0
    print(f"{name:34s} warm {warm:7.2f} s   (first {cold:.1f} s)", flush=True)


timeit("tiled_decode t=None",
       lambda: tiled_decode(params, cfg, z, z_tile=4, hw_tile=512))
timeit("tiled_decode t=0.05 + key",
       lambda: tiled_decode(params, cfg, z, z_tile=4, hw_tile=512,
                            timestep=jnp.asarray(0.05),
                            noise_key=jax.random.key(3)))

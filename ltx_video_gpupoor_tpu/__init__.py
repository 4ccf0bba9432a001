"""TPU-native video-diffusion inference & serving framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
``soasme/LTX-Video-GPUPoor`` (see SURVEY.md):

- LTX-Video 0.9.7 family: 3D DiT (Transformer3D), causal 3D video VAE,
  latent upsampler, T5-XXL text encoding, multi-scale two-pass pipeline
  with CFG / CFG-star / STG guidance, rectified-flow sampling.
- Wan 2.1 family: WanModel DiT (t2v/i2v + VACE / Phantom / ReCamMaster /
  diffusion-forcing), Wan causal VAE, UMT5 encoder, CLIP vision encoder,
  UniPC / DPM++ / flow-match solvers, TeaCache step skipping.

Design stance (vs the reference): weights are HBM-resident and sharded over
an ICI device mesh instead of CPU-offloaded; the attention-kernel zoo becomes
one Pallas flash-attention with segment-id masking; guidance streams are a
batched leading axis instead of joint-pass plumbing; the denoise loop is a
scanned pure function.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: amortizes the ~minutes-scale cold
# compiles (denoise step, tiled VAE) across process restarts.  Opt out
# with LTXV_TPU_COMPILE_CACHE=off.
from .core import compile_cache as _compile_cache

_compile_cache.enable()

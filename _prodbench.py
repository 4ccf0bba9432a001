import time
import numpy as np, jax, jax.numpy as jnp
from PIL import Image
from ltx_video_gpupoor_tpu.serving import model_zoo

m = model_zoo.build_demo_model(0)
gen = m.generator
pipe = gen.pipeline
emb = jax.random.normal(jax.random.key(2), (2, 128, pipe.transformer_cfg.caption_channels))
mask = jnp.ones((2, 128), jnp.int32)
img = np.asarray(Image.open("/tmp/cond.png").convert("RGB"))

def run(seed):
    return gen.generate(
        emb, mask, height=480, width=704, frame_num=121, seed=seed,
        image_start=img, output_type="pixels",
    )

t0 = time.time(); out = run(3); cold = time.time() - t0
t0 = time.time(); out = run(4); warm = time.time() - t0
print(f"production multiscale i2v 704x480x121f (demo weights): cold {cold:.1f}s warm {warm:.1f}s, out {out.shape}")

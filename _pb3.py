import time
import numpy as np, jax, jax.numpy as jnp
from PIL import Image
from ltx_video_gpupoor_tpu.serving import model_zoo
from ltx_video_gpupoor_tpu.utils import media as media_utils

m = model_zoo.build_demo_model(0)
gen = m.generator
pipe = gen.pipeline
emb = jax.random.normal(jax.random.key(2), (2, 128, pipe.transformer_cfg.caption_channels))
mask = jnp.ones((2, 128), jnp.int32)
img = np.asarray(Image.open("/tmp/cond.png").convert("RGB"))

stages = {}
def wrap(obj, name, label):
    orig = getattr(obj, name)
    def f(*a, **k):
        t0 = time.time()
        r = orig(*a, **k)
        jax.block_until_ready(r) if isinstance(r, jax.Array) else None
        stages[label] = stages.get(label, 0) + time.time() - t0
        return r
    setattr(obj, name, f)

wrap(pipe, "generate", "pipe.generate(x2)")
wrap(pipe, "decode", "decode")
wrap(media_utils, "prepare_conditioning_image", "crf/prepare_image")
wrap(media_utils, "pad_media", "pad_media")
wrap(media_utils, "crop_padding", "crop_padding")

def run(seed):
    return gen.generate(
        emb, mask, height=480, width=704, frame_num=121, seed=seed,
        image_start=img, output_type="pixels",
    )

t0 = time.time(); run(3); print(f"cold {time.time()-t0:.1f}s {stages}", flush=True)
stages.clear()
t0 = time.time(); out = run(4); total = time.time()-t0
print(f"warm {total:.1f}s  stages={ {k: round(v,1) for k,v in stages.items()} }", flush=True)

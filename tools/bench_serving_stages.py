"""Warm serving-path stage breakdown (VERDICT r1 #4).

Runs the production multi-scale i2v serving flow twice (cold + warm) on
a demo-size DiT at the full 704x480x121f serving resolution — so denoise
compute is negligible and the numbers isolate the serving OVERHEAD the
round-1 review flagged (18.3 s warm) — and prints the per-stage table
collected by utils/observability.collect_stages:

    media_prep / pass1(prep, cond encode, denoise) / upsample_adain /
    pass2(denoise, tiled decode) / resize_quant_fetch

Run on the real TPU from the repo root:

    python tools/bench_serving_stages.py [--json PATH]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=704)
    ap.add_argument("--frames", type=int, default=121)
    args = ap.parse_args(argv)

    import jax

    from ltx_video_gpupoor_tpu.serving import model_zoo
    from ltx_video_gpupoor_tpu.utils import native_codec
    from ltx_video_gpupoor_tpu.utils.observability import (
        StageTimer,
        collect_stages,
    )

    model = model_zoo.build_demo_model()
    gen = model.generator

    rng = np.random.RandomState(0)
    image = (rng.rand(args.height, args.width, 3) * 255).astype(np.uint8)
    emb = jax.numpy.asarray(rng.randn(2, 128, 32).astype(np.float32))
    mask = jax.numpy.ones((2, 128), jax.numpy.int32)
    # the server fetches planar YUV420 when the native writer exists
    out_type = "yuv420" if native_codec.available() else "pixels"

    def serve():
        return gen.generate(
            emb, mask, height=args.height, width=args.width,
            frame_num=args.frames, image_start=image, seed=7,
            output_type=out_type,
        )

    t0 = time.time()
    frames = serve()
    cold_s = time.time() - t0
    f0 = frames[0] if isinstance(frames, tuple) else frames
    assert f0.dtype == np.uint8 and f0.shape[0] == args.frames

    # honest warm number first (no instrumentation at all)
    t0 = time.time()
    frames = serve()
    warm_plain_s = time.time() - t0

    timer = StageTimer()
    t0 = time.time()
    with collect_stages(timer):
        frames = serve()
    warm_s = time.time() - t0

    print(f"\n== warm serving stage breakdown "
          f"({args.width}x{args.height}x{args.frames}f, demo DiT) ==")
    for name in timer._order:
        v = timer.stages[name]
        print(f"  {name:28s} {v:7.2f} s  {v/warm_s*100:5.1f}%")
    print(f"  {'TOTAL warm (instrumented)':28s} {warm_s:7.2f} s")
    print(f"  warm (uninstrumented): {warm_plain_s:.2f} s")
    print(f"  cold (first call): {cold_s:.1f} s")

    res = {
        "warm_s": round(warm_plain_s, 2),
        "warm_instrumented_s": round(warm_s, 2),
        "cold_s": round(cold_s, 1),
        "stages_s": {k: round(v, 3) for k, v in timer.stages.items()},
    }
    print(json.dumps(res))
    if args.json:
        json.dump(res, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()

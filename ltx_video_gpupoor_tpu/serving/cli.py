"""Inference CLI — flag-for-flag parity with the reference's
``inference.py`` argparse surface (``/root/reference/inference.py:586-656``)
plus TPU-specific knobs (mesh shape, attention mode).

Offline note: the reference downloads checkpoints from HF hub at startup
(``inference.py:51-75, 392-439``); here missing checkpoints are a clear
error, and ``--demo`` runs the full surface with tiny random weights.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="LTXV Video Generation Inference")
    p.add_argument("--prompt", type=str, required=True,
                   help="Input prompt for video generation")
    p.add_argument("--negative-prompt", type=str, default="")
    p.add_argument("--image-start", type=str, default=None,
                   help="Path to start image")
    p.add_argument("--image-end", type=str, default=None,
                   help="Path to end image")
    p.add_argument("--video-source", type=str, default=None,
                   help="Path to input video")
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--image-cond-noise-scale", type=float, default=0.15)
    p.add_argument("--input-media-path", type=str, default=None)
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--video-length", type=int, default=81,
                   help="Number of frames")
    p.add_argument("--frame-rate", type=int, default=30)
    p.add_argument("--fit-into-canvas", action="store_true")
    p.add_argument(
        "--teacache", type=float, default=0.0,
        help="TeaCache speed multiplier (e.g. 1.75); 0 disables. "
        "Step-skip cache over the DiT (the reference ships this for "
        "Wan only)",
    )
    p.add_argument(
        "--bucket-resolution", action="store_true",
        help="snap H/W to the nearest aspect-ratio bin (bounded "
        "compile cache; see utils/resolution.py)",
    )
    p.add_argument(
        "--enhance-prompt", action="store_true",
        help="cinematic prompt rewrite before encoding (Florence-2 "
        "caption + LLM rewrite; the reference wires this path but "
        "hard-disables it, ltxv.py:211). Uses the TPU-native models "
        "when LTXV_TPU_CAPTIONER_DIR / LTXV_TPU_ENHANCER_LLM_DIR "
        "point at checkpoint dirs; falls back to the prompt unchanged",
    )
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--VAE-tile-size", type=int, default=None)
    p.add_argument("--model-mode", type=str, default="ltxv_13B")
    p.add_argument("--quantization", type=str, default="int8")
    p.add_argument("--transformer-dtype-policy", type=str, default="")
    p.add_argument("--quantize-transformer", action="store_true")
    p.add_argument(
        "--int8-mode", choices=("dynamic", "wo", "wo_int4", "mixed_int4"),
        default="dynamic",
        help="quantized runtime: dynamic-activation int8 MXU (faster), "
        "int8 weight-only dequant (memory win), nibble-packed int4 "
        "weight-only (half the int8 footprint; 13B-class on 16 GiB), or "
        "mixed_int4 (per-group int4 bulk + int8 sensitive leaves — "
        "int4's footprint at int8-class accuracy; the 13B/14B default "
        "tier since r5, QUANT_GATE.json)",
    )
    p.add_argument("--mixed-precision-transformer", action="store_true")
    p.add_argument("--save-quantized", action="store_true")
    p.add_argument("--output-path", type=str, default=None)
    p.add_argument("--profile-type-id", type=int, default=2,
                   choices=[1, 2, 3, 4, 5],
                   help="Residency/sharding profile (parity flag; weights "
                        "are HBM-resident on TPU)")
    # TPU-native additions
    p.add_argument("--ckpt-dir", type=str, default="ckpts")
    # default None = flag not given: leave the process-wide mode alone so
    # an LTXV_TPU_ATTN env pin survives; an explicit flag (incl. an
    # explicit --attention auto) always wins
    p.add_argument("--attention", type=str, default=None,
                   choices=["auto", "pallas", "pallas_hp", "pallas_int8",
                            "pallas_int8pv", "xla"])
    p.add_argument("--demo", action="store_true",
                   help="Run with a tiny random-weight model (offline smoke)")
    return p.parse_args(argv)


def encode_or_hash(pipe, prompt: str, negative: str):
    """Real T5 encode (at the serving max_len) when weights + tokenizer
    are loaded, else the deterministic demo hash embeddings. ONE
    definition shared by the CLI and the HTTP server so the encode path
    (and its sequence length) cannot diverge between the two."""
    if pipe.t5_params is not None and pipe.tokenizer is not None:
        return pipe.encode_prompt([negative, prompt])
    return hash_prompt_embeds(
        prompt, negative, 128, pipe.transformer_cfg.caption_channels
    )


def hash_prompt_embeds(prompt: str, negative: str, seq_len: int, dim: int):
    """Deterministic pseudo text embeddings for --demo runs (no T5 weights)."""
    import jax
    import jax.numpy as jnp

    def one(text):
        seed = int.from_bytes(
            hashlib.sha256(text.encode()).digest()[:4], "little"
        )
        return jax.random.normal(jax.random.key(seed), (seq_len, dim))

    emb = jnp.stack([one("neg:" + negative), one("pos:" + prompt)])
    mask = jnp.ones((2, seq_len), jnp.int32)
    return emb, mask


def infer(args) -> str:
    from ..ops.attention import set_attention_mode
    from ..utils import media as media_utils
    from . import model_zoo

    if args.attention is not None:
        set_attention_mode(args.attention)

    if args.demo:
        model = model_zoo.build_demo_model(args.seed)
    else:
        tf_file, te_file = model_zoo.select_model_files(
            args.model_mode, args.quantization, args.transformer_dtype_policy
        )
        try:
            from . import downloads

            downloads.prepare_models_and_enhancers(
                te_file, ckpt_dir=args.ckpt_dir
            )
        except Exception as e:
            # offline / partially-provisioned dirs fall through to the
            # loader, which reports exactly which file is missing
            print(f"checkpoint download skipped: {e}")
        model = model_zoo.load_ltxv_model(
            tf_file, args.model_mode, args.ckpt_dir, te_file
        )

    if args.quantize_transformer or args.save_quantized:
        from ..core.checkpoint import save_quantized_model
        from ..ops.quant import quantize_params

        pipe0 = model.generator.pipeline
        if args.save_quantized:
            out = save_quantized_model(
                os.path.join(args.ckpt_dir, f"{args.model_mode}"),
                pipe0.transformer_params,
            )
            print(f"saved quantized transformer: {out}")
        if args.quantize_transformer:
            pipe0.transformer_params = quantize_params(
                pipe0.transformer_params, mode=args.int8_mode
            )

    gen = model.generator
    pipe = gen.pipeline
    if args.VAE_tile_size is not None:
        # 0 disables tiling entirely; otherwise hw tile pixels (+ z tiling)
        pipe.vae_tile_size = (
            (0, 0) if args.VAE_tile_size == 0 else (4, args.VAE_tile_size)
        )
    image_start = image_end = input_video = None
    if args.image_start or args.image_end:
        from PIL import Image

        def _load_rgb(path):
            return np.asarray(Image.open(path).convert("RGB"))

        if args.image_start:
            image_start = _load_rgb(args.image_start)
        if args.image_end:
            image_end = _load_rgb(args.image_end)
    if args.video_source:
        input_video = media_utils.load_video(args.video_source)

    prompt = args.prompt
    if args.enhance_prompt:
        # the reference wires this path but hard-disables it at serving
        # (ltxv.py:211-221); here it is an opt-in flag backed by the
        # TPU-native Florence-2 captioner + Llama rewrite (models/
        # florence2.py, models/llm.py via LTXV_TPU_CAPTIONER_DIR /
        # LTXV_TPU_ENHANCER_LLM_DIR), with the reference's word-count
        # gate and unchanged-prompt fallback
        from ..utils.prompt_enhance import PromptEnhancer

        enhancer = PromptEnhancer()
        prompt = enhancer.enhance(
            prompt,
            first_frames=[image_start] if image_start is not None else None,
        )
        if prompt != args.prompt:
            print(f"enhanced prompt: {prompt}")
    embeds, mask = encode_or_hash(pipe, prompt, args.negative_prompt)

    from ..utils import native_codec

    # planar-YUV420 fetch halves the host-transfer bytes when the native
    # writer can consume the planes directly
    out_type = "yuv420" if native_codec.available() else "pixels"
    frames = gen.generate(
        embeds, mask,
        height=args.height, width=args.width,
        frame_num=args.video_length, frame_rate=args.frame_rate,
        seed=args.seed,
        image_start=image_start, image_end=image_end,
        input_video=input_video,
        image_cond_noise_scale=args.image_cond_noise_scale,
        fit_into_canvas=args.fit_into_canvas,
        bucket_resolution=args.bucket_resolution,
        teacache_multiplier=args.teacache,
        sampling_steps=args.num_inference_steps,
        strength=args.strength,
        output_type=out_type,
    )

    out_path = args.output_path
    if out_path is None:
        os.makedirs("outputs", exist_ok=True)
        out_path = os.path.join("outputs", f"video_{int(time.time())}.mp4")
    media_utils.save_video(
        frames if isinstance(frames, tuple) else np.asarray(frames),
        out_path, fps=args.frame_rate,
    )
    print(out_path)
    return out_path


def main(argv=None):
    infer(parse_args(argv))


if __name__ == "__main__":
    main()

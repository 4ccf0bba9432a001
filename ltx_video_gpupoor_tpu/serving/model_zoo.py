"""Model selection, checkpoint resolution, and pipeline assembly.

Parity targets in ``/root/reference/inference.py``:
- ``model_signatures`` / ``transformer_choices`` / ``get_model_filename``
  quantization + dtype filename policy (``:94-173``);
- ``select_model_files`` / ``prepare_models_and_enhancers`` download
  definitions (``:384-439``) — downloads require network; in offline
  environments checkpoints must already sit in ``ckpts/``;
- ``load_and_profile_model`` (``:442-496``) — mmgp offload profiles are
  replaced by mesh sharding policies (weights stay HBM-resident).

On TPU there is no pre-Ampere fp16 fallback (``:109-128``): bf16 is always
native, fp16 requests map to bf16.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import load_ltx_pipeline_config
from ..core import checkpoint as ckpt
from ..models import t5 as jt5
from ..models.ltx import latent_upsampler as lup
from ..models.ltx import vae as ltx_vae
from ..models.ltx.transformer3d import LTXTransformerConfig, init_params as tf_init
from ..pipelines.ltx_pipeline import LTXPipeline
from ..pipelines.multiscale import MultiScalePipeline
from .orchestrator import LTXVideoGenerator

def apply_serving_mesh(pipeline: LTXPipeline) -> LTXPipeline:
    """Engage multi-chip serving when ``LTXV_TPU_MESH`` names one (e.g.
    ``dp1,sp2,tp4`` on a v5e-8): DiT weights shard tensor-parallel over
    'tp' (XLA SPMD inserts the ICI collectives per jitted step), and
    sp>1 additionally runs every denoiser evaluation under the USP
    shard_map (Ulysses all-to-all, tokens over 'sp'). Single-device /
    unset env returns the pipeline unchanged. The reference ships the
    capability as dead code (``wan/distributed/xdit_context_parallel.py``
    is imported nowhere); here it is one env var at serving time."""
    import logging

    from ..core.mesh import SEQUENCE_AXIS, mesh_from_env
    from ..parallel.sharding import shard_pipeline

    mesh = mesh_from_env()
    if mesh is None:
        return pipeline
    logging.getLogger(__name__).info(
        "serving mesh engaged: %s",
        dict(zip(mesh.axis_names, mesh.devices.shape)),
    )
    pipeline = shard_pipeline(pipeline, mesh)
    if mesh.shape.get("tp", 1) > 1 and os.environ.get(
        "LTXV_TPU_FUSED_PROLOGUE"
    ):
        # shard_pipeline tp-shards the DiT weights on EVERY mesh style,
        # and the fused adaLN-prologue pallas_call has no SPMD
        # partitioning rule: on tp-sharded weights XLA would gather
        # every DiT weight each step (or fail to compile)
        logging.getLogger(__name__).warning(
            "LTXV_TPU_FUSED_PROLOGUE disabled: no partitioning rule "
            "for the fused kernel on a tp-sharded mesh"
        )
        os.environ.pop("LTXV_TPU_FUSED_PROLOGUE", None)
    if mesh.shape[SEQUENCE_AXIS] > 1:
        pipeline = dataclasses.replace(pipeline, sp_mesh=mesh)
    elif mesh.shape.get("tp", 1) > 1:
        # tp-style mesh: partition the attention kernel over heads
        # instead of letting XLA all-gather around the opaque Pallas
        # call (ops/headpar.py); the attention dispatch ignores the gate
        # inside manual shard_maps, so sp-style serving is unaffected.
        # rope-heads routes the LTX self-attention through the head-split
        # dispatch (numerics exact vs the packed path) so the rule
        # actually reaches it — the packed hp kernel has no
        # partitioning rule.
        os.environ.setdefault("LTXV_TPU_ATTN_HEADPAR", "1")
        os.environ.setdefault("LTXV_TPU_ROPE_HEADS", "1")
    return pipeline


def _score_bound_opt_in() -> Optional[float]:
    """Per-deployment opt-in for the bounded-score (max-free softmax)
    attention tier: env ``LTXV_TPU_SCORE_BOUND=<float>``.  Off by default —
    the bound is an empirical clamp on trained attention sharpness; validate
    it for a checkpoint with ``tools/check_tpu_parity.py --stress`` first
    (ADVICE r1: sharp rows beyond the bound tie after clamping)."""
    raw = os.environ.get("LTXV_TPU_SCORE_BOUND", "").strip()
    if not raw or raw.lower() in ("0", "off", "none", "false"):
        return None
    return float(raw)


TRANSFORMER_CHOICES = [
    "ckpts/ltxv_0.9.7_13B_dev_bf16.safetensors",
    "ckpts/ltxv_0.9.7_13B_dev_quanto_bf16_int8.safetensors",
    "ckpts/ltxv_0.9.7_13B_distilled_lora128_bf16.safetensors",
]

MODEL_SIGNATURES = {
    "ltxv_13B": "ltxv_0.9.7_13B_dev",
    "ltxv_13B_distilled": "ltxv_0.9.7_13B_distilled",
}

TEXT_ENCODER_CHOICES = [
    "ckpts/T5_xxl_1.1/T5_xxl_1.1_enc_bf16.safetensors",
    "ckpts/T5_xxl_1.1/T5_xxl_1.1_enc_quanto_bf16_int8.safetensors",
]


# Finetune checkpoint definitions (``inference.py:107,131-135``): a
# finetune def carries its own checkpoint URLs, which take precedence
# over the signature-based catalogue lookup. The reference populates its
# module-level ``finetunes`` dict from external definition files at app
# startup; deployments here register defs the same way.
FINETUNES: dict = {}


def register_finetune(model_type: str, defn: dict) -> None:
    """Register a finetune definition: ``{"URLs": [...], ...}``."""
    if not defn.get("URLs"):
        raise ValueError(f"finetune def for {model_type!r} needs 'URLs'")
    FINETUNES[model_type] = defn


def get_model_filename(
    model_type: str, quantization: str = "int8", dtype_policy: str = ""
) -> str:
    """Filename policy (``inference.py:130-173``), TPU dtype rules."""
    finetune_def = FINETUNES.get(model_type)
    if finetune_def is not None:
        choices = ["ckpts/" + os.path.basename(p)
                   for p in finetune_def["URLs"]]
    else:
        signature = MODEL_SIGNATURES[model_type]
        choices = [n for n in TRANSFORMER_CHOICES if signature in n]
    if not quantization:
        quantization = "bf16"
    if len(choices) <= 1:
        return choices[0]
    if quantization in ("int8", "fp8"):
        sub = [n for n in choices if quantization in n]
    else:
        sub = [n for n in choices if "quanto" not in n]
    if sub:
        # bf16 on TPU always
        bf = [n for n in sub if "bf16" in n]
        return (bf or sub)[0]
    return choices[0]


def get_text_encoder_filename(quantization: str = "int8") -> str:
    if quantization == "int8":
        return TEXT_ENCODER_CHOICES[1]
    return TEXT_ENCODER_CHOICES[0]


def select_model_files(
    model_mode: str, quantization: str = "int8", dtype_policy: str = ""
) -> tuple[str, str]:
    """(transformer file, text-encoder file) (``inference.py:384-389``)."""
    return (
        get_model_filename(model_mode, quantization, dtype_policy),
        get_text_encoder_filename(quantization),
    )


@dataclasses.dataclass
class LoadedModel:
    generator: LTXVideoGenerator
    tokenizer: object = None


def _maybe(path: Optional[str], ckpt_dir: str) -> Optional[str]:
    """Resolve a checkpoint name against ``ckpt_dir``.

    Filenames may carry the reference's ``ckpts/<subfolder>/`` prefix
    (TEXT_ENCODER_CHOICES) and the download layer preserves the hub
    subfolder layout, so the subfolder-relative path under ``ckpt_dir``
    must be checked too — not just the basename."""
    if not path:
        return None
    rel = path[len("ckpts/"):] if path.startswith("ckpts/") else path
    candidates = [
        os.path.join(ckpt_dir, os.path.basename(path)),
        os.path.join(ckpt_dir, rel),
        path,
    ]
    for cand in candidates:
        if os.path.isfile(cand):
            return cand
    return None


def load_ltxv_model(
    model_filename: str,
    model_mode: str = "ltxv_13B_distilled",
    ckpt_dir: str = "ckpts",
    text_encoder_filename: Optional[str] = None,
    upsampler_filename: Optional[str] = None,
    vae_filename: Optional[str] = None,
    *,
    t5_cfg=None,
) -> LoadedModel:
    """Assemble the full LTX stack from local safetensors checkpoints.

    Raises a clear error when a file is missing (no network in this
    environment; the reference would HF-hub-download here,
    ``inference.py:51-75``).
    """
    # LoRA-only checkpoints (the distilled convention): the file named by
    # the policy is a LoRA — the reference inserts the dev int8 transformer
    # as the BASE and applies the LoRA on top (``inference.py:449-452``,
    # ``:485-493``). Loading the LoRA file as a full model would KeyError.
    lora_filename = None
    if "lora" in os.path.basename(model_filename):
        lora_filename = model_filename
        model_filename = "ltxv_0.9.7_13B_dev_quanto_bf16_int8.safetensors"

    tf_path = _maybe(model_filename, ckpt_dir)
    if tf_path is None:
        raise FileNotFoundError(
            f"transformer checkpoint not found: {model_filename} — place it "
            f"under {ckpt_dir}/ (downloads are unavailable offline)"
        )
    try:
        # native mmap loader with parallel prefetch; python reader fallback
        from ..runtime.native_loader import load_safetensors_native

        tensors, config = load_safetensors_native(tf_path)
    except Exception:
        tensors, config = ckpt.load_safetensors(tf_path)
    tensors = ckpt.dequantize_quanto(tensors)
    tcfg_dict = config.get("transformer", config) if config else {}
    tcfg = LTXTransformerConfig(
        num_attention_heads=tcfg_dict.get("num_attention_heads", 32),
        attention_head_dim=tcfg_dict.get("attention_head_dim", 64),
        in_channels=tcfg_dict.get("in_channels", 128),
        out_channels=tcfg_dict.get("out_channels", 128),
        num_layers=tcfg_dict.get("num_layers", 48),
        cross_attention_dim=tcfg_dict.get("cross_attention_dim", 4096),
        caption_channels=tcfg_dict.get("caption_channels", 4096),
        attention_score_bound=_score_bound_opt_in(),
    )
    tf_params = ckpt.convert_ltx_transformer(tensors, tcfg.num_layers)

    if lora_filename is not None:
        lora_path = _maybe(lora_filename, ckpt_dir)
        if lora_path is None:
            raise FileNotFoundError(
                f"LoRA checkpoint not found: {lora_filename} — place it "
                f"under {ckpt_dir}/"
            )
        from ..core.lora import merge_lora

        lora_sd, _ = ckpt.load_safetensors(lora_path)
        tf_params, n = merge_lora(tf_params, lora_sd, multiplier=1.0)
        if n == 0:
            raise ValueError(f"no LoRA layers matched from {lora_path}")

    # the VAE ships as its own file (``ltxv.py:171``; downloads.py fetches
    # exactly this name). Fall back to the transformer checkpoint only for
    # combined single-file checkpoints; an EXPLICIT missing name errors.
    if vae_filename is None:
        vae_path = _maybe("ltxv_0.9.7_VAE.safetensors", ckpt_dir)
        if vae_path is None:
            vae_path = tf_path
    else:
        vae_path = _maybe(vae_filename, ckpt_dir)
        if vae_path is None:
            raise FileNotFoundError(
                f"VAE checkpoint not found: {vae_filename} under {ckpt_dir}/"
            )
    if vae_path == tf_path:
        # combined checkpoint: reuse the already-loaded (and already
        # dequantized) tensors instead of re-reading a multi-GB file
        vae_tensors, vae_config = tensors, config
    else:
        vae_tensors, vae_config = ckpt.load_safetensors(vae_path)
        vae_tensors = ckpt.dequantize_quanto(vae_tensors)
    vcfg_dict = vae_config.get("vae", vae_config) if vae_config else \
        ltx_vae.LTX_VAE_CONFIG_097
    from ..core.diffusers_compat import maybe_translate_config

    vcfg_dict = maybe_translate_config(vcfg_dict)
    # legacy iff the config says so, or the encoder has a mid_block with
    # res_blocks naming (the causal VAE has no encoder mid_block in native
    # format, and diffusers-format causal mid blocks use "resnets")
    if vcfg_dict.get("_class_name") == "VideoAutoencoder" or any(
        k.startswith("encoder.mid_block.res_blocks.") for k in vae_tensors
    ) or any(
        k.startswith("vae.encoder.mid_block.res_blocks.")
        for k in vae_tensors
    ):
        # pre-causal 2B-era VAE (video_autoencoder.py naming)
        from ..models.ltx import video_autoencoder as legacy_vae

        lvcfg = legacy_vae.LegacyVAEConfig.from_dict(vcfg_dict)
        vcfg = lvcfg
        vae_params = ckpt.convert_legacy_vae(vae_tensors, lvcfg)
    else:
        vcfg = ltx_vae.VAEConfig.from_dict(vcfg_dict)
        vae_params = ckpt.convert_ltx_vae(vae_tensors, vcfg)

    t5_params = tokenizer = None
    if not text_encoder_filename:
        t5_cfg = None
    else:
        te_path = _maybe(text_encoder_filename, ckpt_dir)
        if te_path:
            te_tensors, _ = ckpt.load_safetensors(te_path)
            te_tensors = ckpt.dequantize_quanto(te_tensors)
            if t5_cfg is None:
                t5_cfg = jt5.T5_XXL
            t5_params = ckpt.convert_t5_encoder(
                te_tensors, t5_cfg.num_layers, t5_cfg.shared_pos
            )
        else:
            import logging

            t5_cfg = None
            logging.getLogger(__name__).warning(
                "text encoder checkpoint %s not found under %s — prompt "
                "encoding will use the hash-embedding fallback (demo "
                "quality, NOT production)",
                text_encoder_filename, ckpt_dir,
            )

    pipeline = LTXPipeline(
        transformer_params=tf_params, transformer_cfg=tcfg,
        vae_params=vae_params, vae_cfg=vcfg,
        tokenizer=tokenizer, t5_params=t5_params, t5_cfg=t5_cfg,
    )
    pipeline = apply_serving_mesh(pipeline)

    multiscale = None
    # the download layer provisions "ltxv_0.9.7_spatial_upscaler" (the hub
    # name, ``inference.py:406``); older docs used the dashed LTXV name —
    # accept both so multiscale isn't silently absent at request time
    up_candidates = ([upsampler_filename] if upsampler_filename else []) + [
        "ltxv_0.9.7_spatial_upscaler.safetensors",
        "ltxv-spatial-upscaler-0.9.7.safetensors",
    ]
    up_path = next(
        (p for p in (_maybe(c, ckpt_dir) for c in up_candidates) if p), None
    )
    if up_path:
        up_tensors, up_cfg_dict = ckpt.load_safetensors(up_path)
        up_fields = {f.name for f in dataclasses.fields(
            lup.LatentUpsamplerConfig)}
        up_kwargs = {
            k: v for k, v in (up_cfg_dict or {}).items() if k in up_fields
        }
        if "dims" not in up_kwargs:
            # the reference's from_config DEFAULTS to dims=2 (2-D convs,
            # ``latent_upsampler.py:157``) — infer from the kernel rank
            # when the metadata doesn't say
            w = up_tensors.get("initial_conv.weight")
            if w is not None:
                up_kwargs["dims"] = 2 if w.ndim == 4 else 3
        up_cfg = lup.LatentUpsamplerConfig(**up_kwargs)
        up_params = convert_latent_upsampler(up_tensors)
        multiscale = MultiScalePipeline(
            pipeline=pipeline, upsampler_params=up_params,
            upsampler_cfg=up_cfg,
        )

    config_name = (
        "ltxv-13b-0.9.7-distilled" if "distilled" in model_mode
        else "ltxv-13b-0.9.7-dev"
    )
    return LoadedModel(
        generator=LTXVideoGenerator(
            pipeline=pipeline, multiscale=multiscale,
            pipeline_config=config_name,
        )
    )


def convert_latent_upsampler(sd: dict, dtype=jnp.bfloat16) -> dict:
    """Latent-upsampler state dict -> param tree
    (``latent_upsampler.py:42-110`` naming)."""

    def conv(prefix, kdims=3):
        w = sd[prefix + ".weight"]
        perm = (2, 3, 4, 1, 0) if w.ndim == 5 else (2, 3, 1, 0)
        return {
            "kernel": jnp.asarray(np.transpose(w, perm)).astype(dtype),
            "bias": jnp.asarray(sd[prefix + ".bias"]).astype(dtype),
        }

    def gn(prefix):
        return {
            "weight": jnp.asarray(sd[prefix + ".weight"]).astype(jnp.float32),
            "bias": jnp.asarray(sd[prefix + ".bias"]).astype(jnp.float32),
        }

    def res(prefix):
        return {
            "conv1": conv(prefix + ".conv1"),
            "norm1": gn(prefix + ".norm1"),
            "conv2": conv(prefix + ".conv2"),
            "norm2": gn(prefix + ".norm2"),
        }

    def count(prefix):
        n = 0
        while f"{prefix}.{n}.conv1.weight" in sd:
            n += 1
        return n

    return {
        "initial_conv": conv("initial_conv"),
        "initial_norm": gn("initial_norm"),
        "res_blocks": [
            res(f"res_blocks.{i}") for i in range(count("res_blocks"))
        ],
        "upsampler": conv("upsampler.0"),
        # counted independently: checkpoints may carry different pre/post
        # block counts
        "post_upsample_res_blocks": [
            res(f"post_upsample_res_blocks.{i}")
            for i in range(count("post_upsample_res_blocks"))
        ],
        "final_conv": conv("final_conv"),
    }


def load_wan_model(
    model_filename: str,
    config_name: str = "t2v-1.3B",
    ckpt_dir: str = "ckpts",
    vae_filename: str = "Wan2.1_VAE.safetensors",
    text_encoder_filename: Optional[str] = None,
    clip_filename: Optional[str] = None,
    *,
    spec: Optional[dict] = None,
    vae_cfg=None,
    t5_cfg=None,
    clip_cfg=None,
):
    """Assemble a WanPipeline from local checkpoints
    (the ``WanT2V.__init__`` / ``WanI2V.__init__`` load path,
    ``/root/reference/wan/text2video.py:47-95``).

    ``spec`` / ``vae_cfg`` / ``t5_cfg`` / ``clip_cfg`` override the
    catalogue configs for finetuned or reduced variants (and let the
    layout dress-rehearsal tests drive the full multi-file assembly with
    tiny dims)."""
    from ..configs import WAN_CONFIGS
    from ..models.wan import model as wan_model
    from ..models.wan import vae as wan_vae_mod
    from ..pipelines.wan import WanPipeline

    if spec is None:
        spec = WAN_CONFIGS[config_name]
    cfg = wan_model.WanConfig(
        model_type=spec["model_type"],
        dim=spec["dim"], ffn_dim=spec["ffn_dim"],
        freq_dim=spec["freq_dim"], num_heads=spec["num_heads"],
        num_layers=spec["num_layers"],
        in_dim=spec.get("in_dim", 16),
        attention_score_bound=_score_bound_opt_in(),
    )

    tf_path = _maybe(model_filename, ckpt_dir)
    if tf_path is None:
        raise FileNotFoundError(
            f"Wan transformer checkpoint not found: {model_filename} "
            f"(looked in {ckpt_dir}/; downloads are unavailable offline)"
        )
    tensors, _ = ckpt.load_safetensors(tf_path)
    tensors = ckpt.dequantize_quanto(tensors)
    model_params = ckpt.convert_wan_model(tensors, cfg)

    vae_path = _maybe(vae_filename, ckpt_dir)
    if vae_path is None:
        raise FileNotFoundError(f"Wan VAE checkpoint not found: {vae_filename}")
    if vae_cfg is None:
        vae_cfg = wan_vae_mod.WanVAEConfig()
    vae_tensors, _ = ckpt.load_safetensors(vae_path)
    vae_params = ckpt.convert_wan_vae(vae_tensors, vae_cfg)

    # optional encoders: the pipeline takes pre-computed context/CLIP
    # features, so the loaded params are returned on the pipeline for
    # callers to run models.t5.encode / models.wan.clip.encode with
    extras = {}
    if text_encoder_filename:
        te_path = _maybe(text_encoder_filename, ckpt_dir)
        if te_path is None:
            raise FileNotFoundError(
                f"Wan text encoder checkpoint not found: "
                f"{text_encoder_filename}"
            )
        te_tensors, _ = ckpt.load_safetensors(te_path)
        te_tensors = ckpt.dequantize_quanto(te_tensors)
        tcfg5 = t5_cfg if t5_cfg is not None else jt5.UMT5_XXL
        extras["t5_cfg"] = tcfg5
        extras["t5_params"] = ckpt.convert_t5_encoder(
            te_tensors, tcfg5.num_layers, tcfg5.shared_pos
        )
    if clip_filename:
        clip_path = _maybe(clip_filename, ckpt_dir)
        if clip_path is None:
            raise FileNotFoundError(
                f"Wan CLIP checkpoint not found: {clip_filename}"
            )
        from ..models.wan import clip as wan_clip

        clip_tensors, _ = ckpt.load_safetensors(clip_path)
        extras["clip_cfg"] = (clip_cfg if clip_cfg is not None
                              else wan_clip.CLIPVisionConfig())
        extras["clip_params"] = ckpt.convert_clip_vision(
            clip_tensors, extras["clip_cfg"].num_layers
        )

    pipeline = WanPipeline(
        model_params=model_params, model_cfg=cfg,
        vae_params=vae_params, vae_cfg=vae_cfg,
        vae_stride=tuple(spec["vae_stride"]),
        **extras,
    )
    return apply_wan_serving_mesh(pipeline)


def apply_wan_serving_mesh(pipeline):
    """``LTXV_TPU_MESH`` engages multi-chip Wan serving.

    sp > 1 (USP style): weights replicate over the mesh (the Ulysses
    shard_map runs them replicated — the sequence is the long axis) and
    every denoiser evaluation runs under the sp shard_map; requests
    whose shapes don't divide fall back per-request (pipelines/wan.py).

    sp == 1, tp > 1 (tensor-parallel style): weights shard over 'tp'
    (``wan_param_shardings``) and XLA SPMD partitions every jitted
    denoise step — the memory path for 14B-class checkpoints."""
    import dataclasses as _dc
    import logging

    from ..core.mesh import SEQUENCE_AXIS, mesh_from_env
    from ..parallel.sharding import (
        replicated,
        t5_param_shardings,
        wan_param_shardings,
    )

    mesh = mesh_from_env()
    if mesh is None:
        return pipeline
    sp = mesh.shape.get(SEQUENCE_AXIS, 1)
    tp = mesh.shape.get("tp", 1)
    if sp <= 1 and tp <= 1:
        return pipeline
    logging.getLogger(__name__).info(
        "wan serving mesh engaged: %s",
        dict(zip(mesh.axis_names, mesh.devices.shape)),
    )
    if tp > 1 and getattr(pipeline, "t5_params", None) is not None:
        # the UMT5 encode runs under a plain SPMD jit on every mesh
        # style — tp-sharding it frees the replicated-XXL HBM. Gated on
        # tp > 1: on a tp==1 mesh the specs degenerate to replication,
        # which would COPY 9.4 GB of XXL onto every chip for nothing
        pipeline = _dc.replace(
            pipeline,
            t5_params=jax.tree.map(
                jax.device_put, pipeline.t5_params,
                t5_param_shardings(mesh, pipeline.t5_params),
            ),
        )
    if sp > 1:
        repl = replicated(mesh)
        placed = jax.tree.map(
            lambda x: jax.device_put(x, repl), pipeline.model_params
        )
        return _dc.replace(
            pipeline, model_params=placed, sp_mesh=mesh, mesh=mesh
        )
    placed = jax.tree.map(
        jax.device_put, pipeline.model_params,
        wan_param_shardings(mesh, pipeline.model_params),
    )
    # tp-style mesh: partition the attention kernel over heads instead of
    # letting XLA all-gather around the opaque Pallas call (ops/headpar.py).
    # Process-scoped on purpose: one serving process hosts one model mode,
    # and the dispatch refuses the wrapper under manual shard_map axes.
    os.environ.setdefault("LTXV_TPU_ATTN_HEADPAR", "1")
    return _dc.replace(pipeline, model_params=placed, mesh=mesh)


def build_demo_model(seed: int = 0) -> LoadedModel:
    """Tiny randomly-initialized stack exercising the full serving surface
    (for offline smoke tests; real checkpoints replace this)."""
    tcfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=32,
        caption_channels=32,
    )
    # production compression factors (32x spatial, 8x temporal) so demo
    # runs at real resolutions see real token counts — a tiny-VAE demo at
    # 704x480x121f would otherwise patchify to 320k+ tokens and run the
    # attention grid for minutes
    vcfg = ltx_vae.VAEConfig.from_dict({
        "_class_name": "CausalVideoAutoencoder",
        "dims": 3,
        "latent_channels": 8,
        "blocks": [
            ["res_x", 1], ["compress_all", 1], ["compress_all", 1],
            ["compress_all", 1], ["res_x", 1],
        ],
        "base_channels": 8,
        "norm_num_groups": 4,
        "patch_size": 4,
        "norm_layer": "pixel_norm",
        "latent_log_var": "uniform",
        "use_quant_conv": False,
        "causal_decoder": False,
    })
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    pipeline = LTXPipeline(
        transformer_params=tf_init(k1, tcfg), transformer_cfg=tcfg,
        vae_params=ltx_vae.init_params(k2, vcfg), vae_cfg=vcfg,
    )
    pipeline = apply_serving_mesh(pipeline)
    up_cfg = lup.LatentUpsamplerConfig(
        in_channels=8, mid_channels=32, num_blocks_per_stage=1
    )
    multiscale = MultiScalePipeline(
        pipeline=pipeline,
        upsampler_params=lup.init_params(k3, up_cfg),
        upsampler_cfg=up_cfg,
    )
    return LoadedModel(
        generator=LTXVideoGenerator(
            pipeline=pipeline, multiscale=multiscale,
            # the multi-scale two-pass config — the production i2v path
            pipeline_config="ltxv-13b-0.9.7-distilled",
        )
    )

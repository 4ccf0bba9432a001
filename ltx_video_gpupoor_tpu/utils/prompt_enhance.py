"""Prompt enhancement (LTX) and prompt extension (Wan), gated.

Parity targets:
- LTX cinematic prompt enhancer: Florence-2 image captioning + an
  instruction-tuned LLM rewrite with the cinematic system prompts
  (``/root/reference/ltx_video/utils/prompt_enhance_utils.py`` — wired but
  disabled by default in the reference, ``ltxv.py:211``);
- Wan prompt extenders: local Qwen2.5 / QwenVL models and the remote
  DashScope API (``/root/reference/wan/utils/prompt_extend.py``).

All model-backed paths are gated on transformers model availability; these
run host-side (CPU/torch) outside the jitted graph, exactly as in the
reference. The word-count gate mirrors
``prompt_enhancement_words_threshold`` (configs, default 120).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

# System prompts published with LTX-Video
# (prompt_enhance_utils.py:9-44)
T2V_CINEMATIC_PROMPT = """You are an expert cinematic director with many award winning movies, When writing prompts based on the user input, focus on detailed, chronological descriptions of actions and scenes.
Include specific movements, appearances, camera angles, and environmental details - all in a single flowing paragraph.
Start directly with the action, and keep descriptions literal and precise.
Think like a cinematographer describing a shot list.
Do not change the user input intent, just enhance it.
Keep within 150 words.
For best results, build your prompts using this structure:
Start with main action in a single sentence
Add specific details about movements and gestures
Describe character/object appearances precisely
Include background and environment details
Specify camera angles and movements
Describe lighting and colors
Note any changes or sudden events
Do not exceed the 150 word limit!
Output the enhanced prompt only.
"""

I2V_CINEMATIC_PROMPT = """You are an expert cinematic director with many award winning movies, When writing prompts based on the user input, focus on detailed, chronological descriptions of actions and scenes.
Include specific movements, appearances, camera angles, and environmental details - all in a single flowing paragraph.
Start directly with the action, and keep descriptions literal and precise.
Think like a cinematographer describing a shot list.
Keep within 150 words.
For best results, build your prompts using this structure:
Describe the image first and then add the user input. Image description should be in first priority! Align to the image caption if it contradicts the user text input.
Start with main action in a single sentence
Add specific details about movements and gestures
Describe character/object appearances precisely
Include background and environment details
Specify camera angles and movements
Describe lighting and colors
Note any changes or sudden events
Align to the image caption if it contradicts the user text input.
Do not exceed the 150 word limit!
Output the enhanced prompt only.
"""


def should_enhance(prompt: str, words_threshold: int = 120) -> bool:
    """The reference only enhances short prompts (``pipeline_ltx_video.py``
    enhance path + ``prompt_enhancement_words_threshold``)."""
    return len(prompt.split()) < words_threshold


def _cast_params(params, dtype):
    """Cast floating leaves to the serving dtype (the reference serves
    its enhancer models bf16 — the Llama3_2_quanto_bf16_int8 checkpoint;
    fp32 stays available via dtype=None for exactness tests)."""
    if dtype is None:
        return params
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)
    return jax.tree.map(
        lambda a: a.astype(dt)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        params,
    )


def _checkpoint_eos_ids(path: str, tokenizer) -> tuple:
    """All stop-token ids for a checkpoint dir: the tokenizer's EOS plus
    ``generation_config.json``'s eos list — Llama-3.x Instruct stops at
    <|eot_id|>, which lives only in the generation config on several
    published exports."""
    import json
    import os

    ids = []
    eos = getattr(tokenizer, "eos_token_id", None)
    ids.extend(eos if isinstance(eos, (list, tuple))
               else [] if eos is None else [eos])
    try:
        with open(os.path.join(path, "generation_config.json")) as fh:
            ge = json.load(fh).get("eos_token_id")
        ids.extend(ge if isinstance(ge, list)
                   else [] if ge is None else [ge])
    except Exception:
        pass
    return tuple(dict.fromkeys(int(i) for i in ids))


def _truncate_at_eos(tokens, eos_ids):
    """Cut a generated id row at the first stop token."""
    out = np.asarray(tokens)
    for e in eos_ids:
        hit = np.where(out == e)[0]
        if hit.size:
            out = out[:hit[0]]
    return out


@dataclasses.dataclass
class JaxChatLM:
    """TPU-native chat LLM backend: the framework's own Llama/Qwen2
    implementation (``models/llm.py``) behind the chat-template interface
    the enhancer/extenders speak. The reference runs these rewrites as
    host-side torch ``generate`` calls; here the whole prefill+decode is
    one jitted program on the accelerator. The tokenizer (host-side text
    processing) still comes from the checkpoint dir's tokenizer files."""

    cfg: object
    params: dict
    tokenizer: object
    max_new_tokens: int = 256
    eos_ids: tuple = ()
    _gen_cache: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dir(cls, path: str, dtype="bfloat16", **kw) -> "JaxChatLM":
        from transformers import AutoTokenizer

        from ..models import llm

        cfg, params = llm.load_hf_dir(path)
        tok = AutoTokenizer.from_pretrained(path)
        return cls(cfg=cfg, params=_cast_params(params, dtype),
                   tokenizer=tok,
                   eos_ids=_checkpoint_eos_ids(path, tok), **kw)

    def chat(self, system_prompt: str, user_prompt: str,
             temperature: float = 0.7, seed: int = 0) -> str:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..models import llm

        messages = [
            {"role": "system", "content": system_prompt},
            {"role": "user", "content": user_prompt},
        ]
        ids = np.asarray(self.tokenizer.apply_chat_template(
            messages, add_generation_prompt=True
        ), np.int32)[None]
        eos = self.tokenizer.eos_token_id
        eos_ids = self.eos_ids or (
            tuple(eos) if isinstance(eos, (list, tuple))
            else (eos,) if eos is not None else ())
        # LEFT-pad to a 64-token bucket: one compiled generate program per
        # bucket instead of one per prompt length (eager or per-length
        # compiles would dominate over the relay)
        bucket = -(-ids.shape[1] // 64) * 64
        mask = np.pad(np.ones_like(ids), ((0, 0), (bucket - ids.shape[1], 0)))
        ids = np.pad(ids, ((0, 0), (bucket - ids.shape[1], 0)))
        cache_key = (bucket, temperature, eos_ids)
        gen = self._gen_cache.get(cache_key)
        if gen is None:
            gen = jax.jit(
                lambda p, i, m, k: llm.generate(
                    p, self.cfg, i, m, self.max_new_tokens,
                    eos_ids=eos_ids, temperature=temperature, key=k,
                )
            )
            self._gen_cache[cache_key] = gen
        toks = gen(self.params, jnp.asarray(ids), jnp.asarray(mask),
                   jax.random.key(max(seed, 0)))
        out = _truncate_at_eos(np.asarray(toks)[0], eos_ids)
        return self.tokenizer.decode(
            out, skip_special_tokens=True).strip()


@dataclasses.dataclass
class JaxVLChat:
    """TPU-native Qwen2.5-VL chat backend (``models/qwen25_vl.py``):
    native image preprocessing (``qwen_vl.preprocess_image``), the JAX
    vision tower + M-RoPE LLM, one jitted prefill+decode. Replaces the
    torch ``Qwen2_5_VLForConditionalGeneration.generate`` host path of
    the reference's image-aware extender (prompt_extend.py:398-455)."""

    cfg: object
    params: dict
    tokenizer: object
    max_new_tokens: int = 512
    min_pixels: int = 256 * 28 * 28
    max_pixels: int = 1280 * 28 * 28
    eos_ids: tuple = ()
    _gen_cache: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dir(cls, path: str, dtype="bfloat16", **kw) -> "JaxVLChat":
        from transformers import AutoTokenizer

        from ..models import qwen25_vl

        cfg, params = qwen25_vl.load_hf_dir(path)
        tok = AutoTokenizer.from_pretrained(path)
        return cls(cfg=cfg, params=_cast_params(params, dtype),
                   tokenizer=tok,
                   eos_ids=_checkpoint_eos_ids(path, tok), **kw)

    def chat_with_image(self, system_prompt: str, user_prompt: str,
                        image, temperature: float = 0.0,
                        seed: int = 0) -> str:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..models import qwen25_vl
        from .qwen_vl import fetch_image, preprocess_image

        pil = fetch_image({"image": image, "min_pixels": self.min_pixels,
                           "max_pixels": self.max_pixels})
        v = self.cfg.vision
        patches, grid = preprocess_image(
            pil, patch_size=v.patch_size, merge_size=v.spatial_merge_size,
            temporal_patch_size=v.temporal_patch_size,
            min_pixels=self.min_pixels, max_pixels=self.max_pixels)
        n_img = int(np.prod(grid)) // v.spatial_merge_size ** 2
        # the official Qwen2.5-VL single-image chat layout; the image pad
        # expands to one token per merged patch (the HF processor's
        # placeholder expansion)
        text = (f"<|im_start|>system\n{system_prompt}<|im_end|>\n"
                f"<|im_start|>user\n<|vision_start|><|image_pad|>"
                f"<|vision_end|>{user_prompt}<|im_end|>\n"
                f"<|im_start|>assistant\n")
        ids = self.tokenizer(text, return_attention_mask=False)["input_ids"]
        ids = np.asarray(ids, np.int32)
        pad_pos = np.where(ids == self.cfg.image_token_id)[0]
        if pad_pos.size:
            ids = np.concatenate([
                ids[:pad_pos[0]],
                np.full((n_img,), self.cfg.image_token_id, np.int32),
                ids[pad_pos[0] + 1:],
            ])
        eos = self.tokenizer.eos_token_id
        eos_ids = self.eos_ids or (
            tuple(eos) if isinstance(eos, (list, tuple))
            else (eos,) if eos is not None else ())
        # LEFT-pad the text ids to a 64-token bucket and precompute the
        # M-RoPE positions host-side, so the whole vision+prefill+decode
        # jits as ONE cached program per (bucket, grid) — eager or
        # per-length dispatch would dominate over the relay
        bucket = -(-ids.shape[0] // 64) * 64
        mask = np.pad(np.ones_like(ids), (bucket - ids.shape[0], 0))[None]
        ids = np.pad(ids, (bucket - ids.shape[0], 0))[None]
        pos_np, _ = qwen25_vl.get_rope_index(
            self.cfg, ids, image_grid_thw=np.asarray([grid]),
            attention_mask=mask)
        decode_pos0 = (pos_np.max(axis=(0, 2)) + 1).astype(np.int32)
        cache_key = (bucket, grid, temperature, eos_ids)
        gen = self._gen_cache.get(cache_key)
        if gen is None:
            gen = jax.jit(
                lambda p, i, px, m, pos, d0, k: qwen25_vl.generate(
                    p, self.cfg, i, px, np.asarray([grid]), m,
                    self.max_new_tokens, eos_ids=eos_ids,
                    temperature=temperature, key=k,
                    positions=pos, decode_pos0=d0,
                )
            )
            self._gen_cache[cache_key] = gen
        toks = gen(self.params, jnp.asarray(ids), jnp.asarray(patches),
                   jnp.asarray(mask), jnp.asarray(pos_np),
                   jnp.asarray(decode_pos0),
                   jax.random.key(max(seed, 0)))
        out = _truncate_at_eos(np.asarray(toks)[0], eos_ids)
        return self.tokenizer.decode(out, skip_special_tokens=True).strip()


@dataclasses.dataclass
class JaxFlorenceCaptioner:
    """TPU-native Florence-2 captioner (``models/florence2.py``): native
    768x768 ImageNet-stats preprocessing, the DaViT tower + BART seq2seq
    greedy decode as one jitted program. Replaces the torch
    ``Florence2ForConditionalGeneration.generate`` host path of the
    reference's enhancer (prompt_enhance_utils.py)."""

    cfg: object
    params: dict
    tokenizer: object
    max_new_tokens: int = 256
    image_size: int = 768
    # <DETAILED_CAPTION> task prompt (Florence2Processor
    # task_prompts_without_inputs)
    task_prompt: str = "Describe in detail what is shown in the image."
    _gen_cache: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dir(cls, path: str, dtype="bfloat16",
                 **kw) -> "JaxFlorenceCaptioner":
        from transformers import AutoTokenizer

        from ..models import florence2

        cfg, params = florence2.load_hf_dir(path)
        tok = AutoTokenizer.from_pretrained(path)
        return cls(cfg=cfg, params=_cast_params(params, dtype),
                   tokenizer=tok, **kw)

    def preprocess(self, image) -> "np.ndarray":
        """PIL/array image -> [1, H, W, 3] float32 (resize to the square
        processor size, 1/255 rescale, ImageNet normalize)."""
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        image = image.convert("RGB").resize(
            (self.image_size, self.image_size), Image.Resampling.BICUBIC)
        arr = np.asarray(image, np.float32) / 255.0
        arr = (arr - np.asarray((0.485, 0.456, 0.406), np.float32)) \
            / np.asarray((0.229, 0.224, 0.225), np.float32)
        return arr[None]

    def caption(self, image) -> str:
        import jax.numpy as jnp

        from ..models import florence2

        px = self.preprocess(image)
        # image token count = tower tokens + 1 (the projector's spatial
        # mean token)
        stride = 1
        for s in self.cfg.vision.patch_stride:
            stride *= s
        n_img = (px.shape[1] // stride) * (px.shape[2] // stride) + 1
        tok = self.tokenizer
        text = (tok.bos_token + self.task_prompt + tok.eos_token)
        ids = tok(text, add_special_tokens=False,
                  return_attention_mask=False)["input_ids"]
        ids = np.concatenate([
            np.full((n_img,), self.cfg.image_token_id, np.int64),
            np.asarray(ids, np.int64),
        ])
        # RIGHT-pad the encoder input to a 16-token bucket (BART uses
        # absolute learned positions, so right-padding keeps them) and
        # cache one jitted vision+encode+decode program per bucket
        bucket = -(-len(ids) // 16) * 16
        mask = np.pad(np.ones_like(ids), (0, bucket - len(ids)))[None]
        ids = np.pad(ids, (0, bucket - len(ids)),
                     constant_values=self.cfg.text.pad_token_id)[None]
        gen = self._gen_cache.get(bucket)
        if gen is None:
            import jax

            gen = jax.jit(
                lambda p, i, px, m: florence2.generate(
                    p, self.cfg, i, px, self.max_new_tokens, mask=m)
            )
            self._gen_cache[bucket] = gen
        toks = gen(self.params, jnp.asarray(ids.astype(np.int32)),
                   jnp.asarray(px), jnp.asarray(mask.astype(np.int32)))
        out = _truncate_at_eos(np.asarray(toks)[0],
                               (self.cfg.text.eos_token_id,))
        return self.tokenizer.decode(
            out, skip_special_tokens=True).strip()


@dataclasses.dataclass
class PromptEnhancer:
    """Florence-2 caption + LLM rewrite. Lazily loads transformers models;
    unusable offline — ``enhance`` then returns the prompt unchanged with a
    warning (the reference's behavior when the enhancer is disabled)."""

    caption_model_name: str = "MiaoshouAI/Florence-2-large-PromptGen-v2.0"
    llm_model_name: str = "unsloth/Llama-3.2-3B-Instruct"
    words_threshold: int = 120
    max_new_tokens: int = 256
    # Local HF-layout checkpoint dir for the TPU-native LLM path
    # (models/llm.py); defaults from LTXV_TPU_ENHANCER_LLM_DIR. When set
    # and loadable, the rewrite runs on-device and torch is never touched.
    llm_dir: Optional[str] = None
    # Local HF-layout Florence-2 dir for the TPU-native captioner
    # (models/florence2.py); defaults from LTXV_TPU_CAPTIONER_DIR.
    captioner_dir: Optional[str] = None
    # Serving mode: never fall back to the torch/transformers loaders
    # (which may attempt multi-GB HF Hub downloads while the caller holds
    # the generation lock). When the native checkpoint dirs are unset or
    # unloadable, enhance() just returns the prompt unchanged.
    native_only: bool = False

    _llm = None
    _llm_tokenizer = None
    _jax_lm: Optional[JaxChatLM] = None
    _jax_captioner: Optional[JaxFlorenceCaptioner] = None
    _caption_model = None
    _caption_processor = None

    def _load_jax_captioner(self) -> bool:
        if self._jax_captioner is not None:
            return True
        import os

        path = self.captioner_dir or os.environ.get(
            "LTXV_TPU_CAPTIONER_DIR")
        if not path:
            return False
        try:
            self._jax_captioner = JaxFlorenceCaptioner.from_dir(path)
            return True
        except Exception as e:
            logger.warning("TPU-native captioner unavailable: %s", e)
            return False

    def _load_jax_lm(self) -> bool:
        if self._jax_lm is not None:
            return True
        import os

        path = self.llm_dir or os.environ.get("LTXV_TPU_ENHANCER_LLM_DIR")
        if not path:
            return False
        try:
            self._jax_lm = JaxChatLM.from_dir(
                path, max_new_tokens=self.max_new_tokens)
            return True
        except Exception as e:
            logger.warning("TPU-native enhancer LLM unavailable: %s", e)
            return False

    def _load_llm(self) -> bool:
        if self._llm is not None:
            return True
        if self.native_only:
            return False
        try:
            from transformers import AutoModelForCausalLM, AutoTokenizer

            self._llm_tokenizer = AutoTokenizer.from_pretrained(
                self.llm_model_name
            )
            self._llm = AutoModelForCausalLM.from_pretrained(
                self.llm_model_name
            )
            return True
        except Exception as e:
            logger.warning("prompt enhancer unavailable: %s", e)
            return False

    def _load_captioner(self) -> bool:
        if self._caption_model is not None:
            return True
        if self.native_only:
            return False
        try:
            from transformers import AutoModelForCausalLM, AutoProcessor

            self._caption_processor = AutoProcessor.from_pretrained(
                self.caption_model_name, trust_remote_code=True
            )
            self._caption_model = AutoModelForCausalLM.from_pretrained(
                self.caption_model_name, trust_remote_code=True
            )
            return True
        except Exception as e:
            logger.warning("image captioner unavailable: %s", e)
            return False

    def caption_image(self, image: np.ndarray) -> Optional[str]:
        """Florence-2 detailed caption of [H, W, 3] uint8 image."""
        if self._load_jax_captioner():  # TPU-native path first
            try:
                out = self._jax_captioner.caption(image)
                if out:
                    return out
                # empty caption falls through to the torch path below
            except Exception as e:
                logger.warning("TPU-native caption failed: %s", e)
        if not self._load_captioner():
            return None
        import torch
        from PIL import Image

        pil = Image.fromarray(image)
        task = "<DETAILED_CAPTION>"
        inputs = self._caption_processor(
            text=task, images=pil, return_tensors="pt"
        )
        with torch.no_grad():
            ids = self._caption_model.generate(
                input_ids=inputs["input_ids"],
                pixel_values=inputs["pixel_values"],
                max_new_tokens=256, do_sample=False,
            )
        text = self._caption_processor.batch_decode(
            ids, skip_special_tokens=False
        )[0]
        parsed = self._caption_processor.post_process_generation(
            text, task=task, image_size=pil.size
        )
        return parsed.get(task, "").strip()

    def _rewrite(self, system_prompt: str, user_prompt: str) -> Optional[str]:
        if self._load_jax_lm():  # TPU-native path first
            try:
                out = self._jax_lm.chat(system_prompt, user_prompt,
                                        temperature=0.7)
                if out:
                    return out
                # empty rewrite falls through to the torch path below
            except Exception as e:
                logger.warning("TPU-native rewrite failed: %s", e)
        if not self._load_llm():
            return None
        import torch

        messages = [
            {"role": "system", "content": system_prompt},
            {"role": "user", "content": user_prompt},
        ]
        ids = self._llm_tokenizer.apply_chat_template(
            messages, add_generation_prompt=True, return_tensors="pt"
        )
        with torch.no_grad():
            out = self._llm.generate(
                ids, max_new_tokens=self.max_new_tokens, do_sample=True,
                temperature=0.7,
            )
        return self._llm_tokenizer.decode(
            out[0][ids.shape[1]:], skip_special_tokens=True
        ).strip()

    def enhance(
        self,
        prompt: str,
        first_frames: Optional[Sequence[np.ndarray]] = None,
    ) -> str:
        """t2v (no frames) or i2v (caption + rewrite) enhancement; returns
        the original prompt unchanged when gating or models fail."""
        if not should_enhance(prompt, self.words_threshold):
            return prompt
        if first_frames:
            captions = [
                c for c in (self.caption_image(f) for f in first_frames) if c
            ]
            if not captions:
                return prompt
            user = (
                f"user_prompt: {prompt}\nimage_caption: {'; '.join(captions)}"
            )
            out = self._rewrite(I2V_CINEMATIC_PROMPT, user)
        else:
            out = self._rewrite(T2V_CINEMATIC_PROMPT, f"user_prompt: {prompt}")
        return out or prompt


# ---------------------------------------------------------------------------
# Wan prompt extenders (prompt_extend.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class QwenPromptExpander:
    """Local Qwen2.5-based extension (``prompt_extend.py:300-365``), gated
    on model availability."""

    model_name: str = "Qwen/Qwen2.5-3B-Instruct"
    # Local HF-layout dir for the TPU-native Qwen2 path (models/llm.py);
    # defaults from LTXV_TPU_EXTENDER_LLM_DIR.
    model_dir: Optional[str] = None
    _model = None
    _tokenizer = None
    _jax_lm: Optional[JaxChatLM] = None

    SYSTEM_EN = (
        "You are a prompt engineer for text-to-video models. Rewrite the "
        "user's prompt into a single detailed English paragraph describing "
        "subjects, appearance, actions, scene, lighting, and camera "
        "movement, preserving the user's intent. Output the rewritten "
        "prompt only."
    )

    def extend(self, prompt: str, seed: int = -1) -> str:
        import os

        path = self.model_dir or os.environ.get("LTXV_TPU_EXTENDER_LLM_DIR")
        if path or self._jax_lm is not None:
            try:
                if self._jax_lm is None:
                    self._jax_lm = JaxChatLM.from_dir(path,
                                                      max_new_tokens=512)
                out = self._jax_lm.chat(self.SYSTEM_EN, prompt,
                                        seed=max(seed, 0))
                if out:
                    return out
            except Exception as e:
                logger.warning("TPU-native Qwen extender failed: %s", e)
        try:
            import torch
            from transformers import AutoModelForCausalLM, AutoTokenizer

            if self._model is None:
                self._tokenizer = AutoTokenizer.from_pretrained(self.model_name)
                self._model = AutoModelForCausalLM.from_pretrained(
                    self.model_name
                )
            messages = [
                {"role": "system", "content": self.SYSTEM_EN},
                {"role": "user", "content": prompt},
            ]
            ids = self._tokenizer.apply_chat_template(
                messages, add_generation_prompt=True, return_tensors="pt"
            )
            with torch.no_grad():
                out = self._model.generate(ids, max_new_tokens=512)
            return self._tokenizer.decode(
                out[0][ids.shape[1]:], skip_special_tokens=True
            ).strip() or prompt
        except Exception as e:
            logger.warning("Qwen prompt expander unavailable: %s", e)
            return prompt


@dataclasses.dataclass
class QwenVLPromptExpander:
    """Image-aware Qwen2.5-VL extension (``prompt_extend.py:300-365``,
    ``extend_with_img`` at ``:398-455``): the first frame rides along in
    the chat messages, vision elements are decoded/smart-resized by
    ``utils.qwen_vl.process_vision_info``, and the VL processor builds
    the multimodal generate() inputs. Gated on model availability; the
    plumbing is stub-testable by injecting ``_model``/``_processor``."""

    model_name: str = "Qwen/Qwen2.5-VL-7B-Instruct"
    # Local HF-layout dir for the TPU-native path (models/qwen25_vl.py);
    # defaults from LTXV_TPU_EXTENDER_VL_DIR.
    model_dir: Optional[str] = None
    max_new_tokens: int = 512
    _model = None
    _processor = None
    _jax_vl: Optional[JaxVLChat] = None

    SYSTEM_EN = (
        "You are a prompt engineer for image-to-video models. Using the "
        "attached image as the first frame, rewrite the user's prompt "
        "into a single detailed English paragraph that stays faithful to "
        "the image's subjects, appearance, style, and composition, then "
        "describes their motion, the scene, lighting, and camera "
        "movement. Output the rewritten prompt only."
    )

    def _load(self) -> bool:
        if self._model is not None:
            return True
        try:
            from transformers import (
                AutoProcessor,
                Qwen2_5_VLForConditionalGeneration,
            )

            # the reference's processor pixel budget (prompt_extend.py:340)
            self._processor = AutoProcessor.from_pretrained(
                self.model_name, min_pixels=256 * 28 * 28,
                max_pixels=1280 * 28 * 28, use_fast=True,
            )
            self._model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
                self.model_name, device_map="cpu"
            )
            return True
        except Exception as e:
            logger.warning("Qwen-VL prompt expander unavailable: %s", e)
            return False

    def extend_with_img(self, prompt: str, image, seed: int = -1,
                        system_prompt: str | None = None) -> str:
        """``image``: PIL image, local path, file:// or data: URI (the
        forms ``qwen_vl.fetch_image`` accepts). Returns the rewritten
        prompt, or ``prompt`` unchanged when the model is unavailable."""
        import os

        path = self.model_dir or os.environ.get("LTXV_TPU_EXTENDER_VL_DIR")
        if path or self._jax_vl is not None:
            try:
                if self._jax_vl is None:
                    self._jax_vl = JaxVLChat.from_dir(
                        path, max_new_tokens=self.max_new_tokens)
                out = self._jax_vl.chat_with_image(
                    system_prompt or self.SYSTEM_EN, prompt, image,
                    seed=max(seed, 0))
                if out:
                    return out
            except Exception as e:
                logger.warning("TPU-native VL extender failed: %s", e)
        if not self._load():
            return prompt
        import torch

        from .qwen_vl import process_vision_info

        messages = [
            {"role": "system", "content": [
                {"type": "text", "text": system_prompt or self.SYSTEM_EN},
            ]},
            {"role": "user", "content": [
                {"type": "image", "image": image},
                {"type": "text", "text": prompt},
            ]},
        ]
        text = self._processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        image_inputs, video_inputs = process_vision_info(messages)
        inputs = self._processor(
            text=[text], images=image_inputs, videos=video_inputs,
            padding=True, return_tensors="pt",
        )
        with torch.no_grad():
            generated = self._model.generate(
                **inputs, max_new_tokens=self.max_new_tokens
            )
        trimmed = [
            out_ids[len(in_ids):]
            for in_ids, out_ids in zip(inputs["input_ids"], generated)
        ]
        out = self._processor.batch_decode(
            trimmed, skip_special_tokens=True,
            clean_up_tokenization_spaces=False,
        )[0]
        return out.strip() or prompt


@dataclasses.dataclass
class DashScopePromptExpander:
    """Remote DashScope extension (``prompt_extend.py:157``): requires
    network + API key; unusable in zero-egress environments."""

    model_name: str = "qwen-plus"
    api_key: Optional[str] = None

    def extend(self, prompt: str, seed: int = -1) -> str:
        try:
            import dashscope  # noqa: F401
        except ImportError:
            logger.warning("dashscope not installed; returning prompt as-is")
            return prompt
        raise RuntimeError(
            "DashScope requires network access (zero-egress environment)"
        )

"""Checkpoint volume provisioning (the Beam uploader equivalent).

Parity target: ``/root/reference/upload.py`` — a remote beam function that
triggers model downloads into the deployment volume (note: the reference
file has a syntax error at ``upload.py:26`` and cannot actually run). Here:
a host-side utility that verifies/loads every checkpoint the selected model
mode needs into ``ckpts/`` so server cold-starts are warm. Downloads
require network (HF hub); in zero-egress environments this only validates
presence.
"""

from __future__ import annotations

import os

from . import model_zoo


def provision(
    model_mode: str = "ltxv_13B_distilled",
    quantization: str = "int8",
    ckpt_dir: str = "ckpts",
    download: bool = True,
) -> dict:
    """Ensure all checkpoints for ``model_mode`` exist under ``ckpt_dir``.

    Returns {filename: "present" | "downloaded" | "missing"}."""
    os.makedirs(ckpt_dir, exist_ok=True)
    tf_file, te_file = model_zoo.select_model_files(model_mode, quantization)
    needed = [
        tf_file,
        te_file,
        "ltxv-spatial-upscaler-0.9.7.safetensors",
    ]
    status = {}
    for name in needed:
        local = os.path.join(ckpt_dir, os.path.basename(name))
        if os.path.isfile(local) or os.path.isfile(name):
            status[name] = "present"
            continue
        if download:
            try:
                from huggingface_hub import hf_hub_download

                hf_hub_download(
                    repo_id="DeepBeepMeep/LTX_Video",
                    filename=os.path.basename(name),
                    local_dir=ckpt_dir,
                )
                status[name] = "downloaded"
                continue
            except Exception:
                pass
        status[name] = "missing"
    return status


if __name__ == "__main__":
    for k, v in provision().items():
        print(f"{v:>10}  {k}")

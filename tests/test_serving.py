"""Serving surface tests: CLI end-to-end (demo model), HTTP server routes,
media utilities."""

import base64
import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from ltx_video_gpupoor_tpu.serving import model_zoo
from ltx_video_gpupoor_tpu.serving.cli import infer, parse_args
from ltx_video_gpupoor_tpu.serving.orchestrator import pad_dimensions
from ltx_video_gpupoor_tpu.serving.server import (
    InferenceService,
    create_stdlib_server,
)
from ltx_video_gpupoor_tpu.utils import media as media_utils


def test_pad_dimensions():
    assert pad_dimensions(480, 832, 81) == (480, 832, 81)
    assert pad_dimensions(479, 831, 80) == (480, 832, 81)
    assert pad_dimensions(100, 100, 9) == (128, 128, 9)


def test_calculate_new_dimensions():
    h, w = media_utils.calculate_new_dimensions(480, 832, 1080, 1920, True, 32)
    assert h % 32 == 0 and w % 32 == 0


def test_model_filename_policy():
    assert "quanto_bf16_int8" in model_zoo.get_model_filename(
        "ltxv_13B", "int8"
    )
    assert "quanto" not in model_zoo.get_model_filename("ltxv_13B", "bf16")
    assert "distilled" in model_zoo.get_model_filename(
        "ltxv_13B_distilled", "int8"
    )


def test_missing_checkpoint_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="offline"):
        model_zoo.load_ltxv_model(
            "nonexistent.safetensors", ckpt_dir=str(tmp_path)
        )


def test_cli_demo_end_to_end(tmp_path):
    out = str(tmp_path / "vid.mp4")
    args = parse_args([
        "--prompt", "a cat", "--demo", "--height", "64", "--width", "64",
        "--video-length", "9", "--num-inference-steps", "2",
        "--output-path", out, "--attention", "xla",
    ])
    path = infer(args)
    assert os.path.isfile(path)
    video = media_utils.load_video(path)
    assert video.shape[0] == 9
    assert video.shape[1:3] == (64, 64)


def test_cli_attention_flag_defaults_to_none():
    """Without --attention the CLI must leave the process-wide attention
    mode alone, so an LTXV_TPU_ATTN env pin survives into serving
    (review finding: the old default \"auto\" clobbered the env knob)."""
    args = parse_args(["--prompt", "a cat"])
    assert args.attention is None
    args = parse_args(["--prompt", "a cat", "--attention", "pallas"])
    assert args.attention == "pallas"


def test_cli_demo_i2v(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "start.png")
    Image.fromarray(
        (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    ).save(img_path)
    out = str(tmp_path / "vid.mp4")
    args = parse_args([
        "--prompt", "a dog", "--demo", "--height", "64", "--width", "64",
        "--video-length", "9", "--num-inference-steps", "2",
        "--image-start", img_path, "--output-path", out,
        "--attention", "xla",
    ])
    path = infer(args)
    assert os.path.isfile(path)


@pytest.fixture(scope="module")
def server():
    service = InferenceService(
        model=model_zoo.build_demo_model(), outputs_dir="outputs_test",
        warmup_spec="off",  # no full-res background warmup in tests
    )
    srv = create_stdlib_server(service, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_parse_mesh_spec():
    from ltx_video_gpupoor_tpu.core.mesh import MeshConfig, parse_mesh_spec

    assert parse_mesh_spec("dp2,sp2,tp2") == MeshConfig(dp=2, sp=2, tp=2)
    assert parse_mesh_spec("sp=4,tp=2") == MeshConfig(dp=1, sp=4, tp=2)
    assert parse_mesh_spec("auto") == MeshConfig(dp=1, sp=1, tp=-1)
    for off in ("", "off", "none", "0"):
        assert parse_mesh_spec(off) is None
    with pytest.raises(ValueError):
        parse_mesh_spec("xx4")


def test_serving_mesh_from_env_matches_single_device(tmp_path, monkeypatch):
    """LTXV_TPU_MESH engages multi-chip serving at model build: DiT
    weights tp-sharded, denoise under USP (sp>1) — and the output equals
    the single-device demo model bit-for-bit at matching seeds. A spec
    that doesn't fit the visible devices must degrade to single-device,
    not take the server down."""
    import jax

    from ltx_video_gpupoor_tpu.core.mesh import mesh_from_env

    emb = np.zeros((2, 16, 32), np.float32)
    kw = dict(height=64, width=64, frame_num=9, sampling_steps=2, seed=5)

    base = model_zoo.build_demo_model().generator.generate(
        emb, np.ones((2, 16), np.int32), **kw
    )

    monkeypatch.setenv("LTXV_TPU_MESH", "dp2,sp2,tp2")
    model = model_zoo.build_demo_model()
    pipe = model.generator.pipeline
    assert pipe.sp_mesh is not None
    spec = pipe.transformer_params["blocks"]["attn1"]["to_q"]["kernel"]
    assert spec.sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    out = model.generator.generate(emb, np.ones((2, 16), np.int32), **kw)
    np.testing.assert_allclose(out, base, atol=2e-2, rtol=2e-2)

    # a shape whose frame groups don't divide sp falls back to the
    # single-program path for that call instead of erroring the request
    # (17 frames -> 3 latent frame groups, sp=2)
    out17 = model.generator.generate(
        emb, np.ones((2, 16), np.int32),
        height=64, width=64, frame_num=17, sampling_steps=2, seed=5,
    )
    assert out17.shape[0] == 17

    # a mis-sized spec logs and serves single-device
    monkeypatch.setenv("LTXV_TPU_MESH", "dp64,sp2,tp2")
    assert mesh_from_env() is None
    assert model_zoo.build_demo_model().generator.pipeline.sp_mesh is None


def test_serving_mesh_tp_style_matches_single_device(monkeypatch):
    """tp-style LTX serving (sp==1): weights shard over 'tp', XLA SPMD
    partitions the jitted denoise, output equals single-device. The env
    gates the tp branch sets are undone so later tests stay clean."""
    import os

    import jax

    emb = np.zeros((2, 16, 32), np.float32)
    kw = dict(height=64, width=64, frame_num=9, sampling_steps=2, seed=7)
    base = model_zoo.build_demo_model().generator.generate(
        emb, np.ones((2, 16), np.int32), **kw
    )

    monkeypatch.setenv("LTXV_TPU_MESH", "dp1,sp1,tp8")
    monkeypatch.delenv("LTXV_TPU_ATTN_HEADPAR", raising=False)
    monkeypatch.delenv("LTXV_TPU_ROPE_HEADS", raising=False)
    try:
        model = model_zoo.build_demo_model()
        pipe = model.generator.pipeline
        assert pipe.sp_mesh is None
        assert pipe.mesh is not None
        spec = pipe.transformer_params["blocks"]["attn1"]["to_q"]["kernel"]
        assert spec.sharding.spec == jax.sharding.PartitionSpec(
            None, None, "tp"
        )
        # rope-heads rerouting is numerics-exact; headpar is inert in
        # the CPU xla mode, engaged on TPU pallas modes
        assert os.environ.get("LTXV_TPU_ROPE_HEADS") == "1"
        out = model.generator.generate(emb, np.ones((2, 16), np.int32),
                                       **kw)
        # uint8 frames: SPMD fusion order can flip a half-ULP at the
        # quantize boundary — allow off-by-one
        np.testing.assert_allclose(
            out.astype(np.int16), base.astype(np.int16), atol=1
        )
    finally:
        os.environ.pop("LTXV_TPU_ATTN_HEADPAR", None)
        os.environ.pop("LTXV_TPU_ROPE_HEADS", None)


def test_wan_serving_mesh_styles(monkeypatch):
    """apply_wan_serving_mesh routes by mesh style: sp>1 -> USP with
    replicated weights (sp_mesh AND mesh set); sp==1/tp>1 -> tp-sharded
    weights, mesh set for the parallel decode, headpar gate defaulted."""
    import jax

    from ltx_video_gpupoor_tpu.models.wan import model as wan_model
    from ltx_video_gpupoor_tpu.models.wan import vae as wvae
    from ltx_video_gpupoor_tpu.pipelines.wan import WanPipeline

    cfg = wan_model.WanConfig(
        dim=64, ffn_dim=128, num_heads=2, num_layers=2, text_dim=16,
        in_dim=4, out_dim=4, freq_dim=32, text_len=8,
        patch_size=(1, 2, 2), model_type="t2v",
    )
    vcfg = wvae.WanVAEConfig(
        dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,),
    )
    pipe = WanPipeline(
        model_params=wan_model.init_params(jax.random.key(0), cfg),
        model_cfg=cfg,
        vae_params=wvae.init_params(jax.random.key(1), vcfg),
        vae_cfg=vcfg,
    )

    monkeypatch.setenv("LTXV_TPU_MESH", "dp2,sp2,tp2")
    sp_style = model_zoo.apply_wan_serving_mesh(pipe)
    assert sp_style.sp_mesh is not None
    assert sp_style.mesh is not None

    monkeypatch.setenv("LTXV_TPU_MESH", "dp1,sp1,tp8")
    monkeypatch.delenv("LTXV_TPU_ATTN_HEADPAR", raising=False)
    import os

    try:
        tp_style = model_zoo.apply_wan_serving_mesh(pipe)
        assert tp_style.sp_mesh is None
        assert tp_style.mesh is not None  # parallel decode engages
        kern = tp_style.model_params["blocks"]["self_attn"]["q"]["kernel"]
        assert kern.sharding.spec == jax.sharding.PartitionSpec(
            None, None, "tp"
        )
        assert os.environ.get("LTXV_TPU_ATTN_HEADPAR") == "1"
    finally:
        # the function sets the gate via os.environ.setdefault (NOT
        # monkeypatch), so undo it here or every later test in the
        # process runs with headpar globally enabled
        os.environ.pop("LTXV_TPU_ATTN_HEADPAR", None)
        os.environ.pop("LTXV_TPU_ROPE_HEADS", None)


def test_provision_required_files_cover_cold_start():
    """provision()'s file list must include everything load_ltxv_model +
    encode_prompt need: the dev int8 base for the LoRA-distilled mode,
    the standalone VAE, the upscaler, and the tokenizer files under the
    hub subfolder."""
    from ltx_video_gpupoor_tpu.serving.upload import required_files

    items = required_files("ltxv_13B_distilled", "int8")
    names = {n for _, n in items}
    assert "ltxv_0.9.7_13B_dev_quanto_bf16_int8.safetensors" in names
    assert "ltxv_0.9.7_VAE.safetensors" in names
    assert "ltxv_0.9.7_spatial_upscaler.safetensors" in names
    assert "spiece.model" in names
    # tokenizer + text encoder carry the hub subfolder
    folders = {f for f, n in items if n == "spiece.model"}
    assert folders == {"T5_xxl_1.1"}


def test_server_rejects_non_object_body(server):
    req = urllib.request.Request(
        server + "/", data=b"[1, 2]",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_download_path_rejects_sibling_dirs(tmp_path):
    from ltx_video_gpupoor_tpu.serving.server import InferenceService

    out = tmp_path / "outputs"
    sibling = tmp_path / "outputs_archive"
    out.mkdir()
    sibling.mkdir()
    (sibling / "secret.mp4").write_bytes(b"x")
    (out / "ok.mp4").write_bytes(b"y")
    svc = InferenceService(
        model=model_zoo.build_demo_model(), outputs_dir=str(out),
        warmup_spec="off",
    )
    assert svc.download_path("ok.mp4") is not None
    assert svc.download_path("../outputs_archive/secret.mp4") is None


def test_server_download_with_query_string(server, tmp_path):
    # generate once via POST, then fetch the download URL with a
    # tracking query param appended (stdlib handler must strip it)
    buf = io.BytesIO()
    from PIL import Image

    Image.fromarray(
        (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    body = {
        "image": base64.b64encode(buf.getvalue()).decode(),
        "prompt": "a cat", "negative_prompt": "blurry",
        "height": 64, "width": 64, "num_frames": 9, "frame_rate": 16,
        "num_inference_steps": 2,
    }
    req = urllib.request.Request(
        server + "/", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
    url = resp[0]["video"] + "?creation_id=7"
    data = urllib.request.urlopen(url, timeout=60).read()
    assert len(data) > 0


def test_server_missing_fields(server):
    req = urllib.request.Request(
        server + "/", data=json.dumps({"prompt": "x"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "Missing fields" in json.loads(e.read())["error"]


def test_server_end_to_end(server):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    payload = {
        "image": base64.b64encode(buf.getvalue()).decode(),
        "prompt": "a cat",
        "negative_prompt": "",
        "height": 64,
        "width": 64,
        "num_frames": 9,
        "frame_rate": 25,
        "num_inference_steps": 2,
        "creation_id": "test-1",
    }
    req = urllib.request.Request(
        server + "/", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
    assert isinstance(resp, list) and "video" in resp[0]
    url = resp[0]["video"]
    # download route works
    data = urllib.request.urlopen(url, timeout=60).read()
    assert len(data) > 0


def test_save_and_load_video_roundtrip(tmp_path):
    frames = np.random.rand(5, 32, 32, 3).astype(np.float32) * 2 - 1
    path = str(tmp_path / "t.mp4")
    media_utils.save_video(frames, path, fps=10)
    back = media_utils.load_video(path)
    assert back.shape == frames.shape


def test_crf_compress_identity_shape():
    img = np.random.rand(64, 64, 3).astype(np.float32)
    out = media_utils.crf_compress(img)
    assert out.shape == img.shape
    assert out.dtype == np.float32


def test_server_metrics_route(server):
    data = json.loads(urllib.request.urlopen(server + "/metrics").read())
    assert "counters" in data and "gauges" in data


def test_cli_v2v_with_strength(tmp_path):
    # build a tiny source video then run v2v at strength 0.8 (the demo
    # distilled config's explicit schedule bottoms at 0.725, and strength
    # truncates it — reference ``retrieve_timesteps`` semantics)
    src = str(tmp_path / "src.mp4")
    frames = np.random.rand(9, 64, 64, 3).astype(np.float32) * 2 - 1
    media_utils.save_video(frames, src, fps=10)
    out = str(tmp_path / "out.mp4")
    args = parse_args([
        "--prompt", "stylized", "--demo", "--height", "64", "--width", "64",
        "--video-length", "9", "--num-inference-steps", "4",
        "--video-source", src, "--strength", "0.8",
        "--output-path", out, "--attention", "xla",
    ])
    path = infer(args)
    assert os.path.isfile(path)


def test_v2v_strength_below_schedule_min_raises(tmp_path):
    """Strength below the explicit schedule's minimum timestep must raise
    the reference's descriptive error (``pipeline_ltx_video.py:190-196``)
    — previously explicit lists ignored strength entirely."""
    import jax
    import jax.numpy as jnp

    model = model_zoo.build_demo_model(0)
    gen = model.generator
    emb = jax.random.normal(
        jax.random.key(0),
        (2, 16, gen.pipeline.transformer_cfg.caption_channels),
    )
    mask = jnp.ones((2, 16), jnp.int32)
    video = np.random.rand(9, 64, 64, 3).astype(np.float32) * 2 - 1
    with pytest.raises(ValueError, match="max_timestep"):
        gen.generate(
            emb, mask, height=64, width=64, frame_num=9, seed=0,
            input_video=video, strength=0.1, output_type="latent",
        )


def test_downloads_idempotent_offline(tmp_path):
    """Fully-provisioned checkpoint dir: no network, no hub import."""
    from ltx_video_gpupoor_tpu.serving import downloads

    d = downloads.LTX_TEXT_ENCODER_DEF
    for folder, files in zip(d["sourceFolderList"], d["fileList"]):
        for name in files + (["te.safetensors"] if folder else []):
            p = tmp_path / folder / name if folder else tmp_path / name
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"x")
    fetched = downloads.prepare_models_and_enhancers(
        "te.safetensors", ckpt_dir=str(tmp_path)
    )
    assert fetched == []
    assert downloads.compute_list(None) == []
    assert downloads.compute_list("a/b/c.safetensors") == ["c.safetensors"]


def test_multiscale_output_resized_to_request():
    """Multi-scale pass 2 decodes at 2x the downscaled dims (128 for a 96
    request); the final frames must come back at the requested size
    (reference resize, ``pipeline_ltx_video.py:1891-1903``)."""
    import jax
    import jax.numpy as jnp

    model = model_zoo.build_demo_model(0)
    gen = model.generator
    pipe = gen.pipeline
    emb = jax.random.normal(
        jax.random.key(0), (2, 16, pipe.transformer_cfg.caption_channels)
    )
    mask = jnp.ones((2, 16), jnp.int32)
    frames = gen.generate(
        emb, mask, height=96, width=96, frame_num=9, seed=0,
        sampling_steps=2, output_type="pixels",
    )
    assert frames.shape == (9, 96, 96, 3)


def test_v2v_multiscale_dims_single_source():
    """h=w=480 is divisible by 96, where the YAML downscale factor
    0.6666666 and float 2/3 disagree by one unit in int() — previously
    the orchestrator's pass-1 latent grid desynced from the multiscale
    pipeline's by a whole 32-px block, crashing the v2v init lerp."""
    import jax
    import jax.numpy as jnp

    model = model_zoo.build_demo_model(0)
    gen = model.generator
    ms = gen.multiscale
    # the generator must adopt the config's factor, and both sides must
    # compute the same pass-1 dims
    df = gen.pipeline_config["downscale_factor"]
    import dataclasses as _dc

    ms_cfg = _dc.replace(ms, downscale_factor=df)
    assert ms_cfg.downscaled_dims(480, 480) == (288, 288)
    emb = jax.random.normal(
        jax.random.key(0),
        (2, 16, gen.pipeline.transformer_cfg.caption_channels),
    )
    mask = jnp.ones((2, 16), jnp.int32)
    video = np.random.rand(9, 480, 480, 3).astype(np.float32) * 2 - 1
    out = gen.generate(
        emb, mask, height=480, width=480, frame_num=9, seed=0,
        input_video=video, strength=0.8, output_type="latent",
    )
    assert out is not None


def test_conditioning_video_trimmed_to_target():
    """A conditioning video longer than the requested frame count is
    trimmed to N*temporal_factor+1 frames (reference
    ``trim_conditioning_sequence``) instead of crashing the
    dynamic_update_slice."""
    import jax
    import jax.numpy as jnp

    model = model_zoo.build_demo_model(0)
    gen = model.generator
    emb = jax.random.normal(
        jax.random.key(0),
        (2, 16, gen.pipeline.transformer_cfg.caption_channels),
    )
    mask = jnp.ones((2, 16), jnp.int32)
    video = np.random.rand(25, 64, 64, 3).astype(np.float32) * 2 - 1
    out = gen.generate(
        emb, mask, height=64, width=64, frame_num=9, seed=0,
        input_video=video, strength=1.0, output_type="latent",
    )
    assert out is not None


def test_oversize_input_video_resized_to_working_dims():
    """Input video above the MAX dims: the working dims clamp, and the
    frames must be resized to them (previously pad/crop bookkeeping
    applied to the unresized frames)."""
    import jax
    import jax.numpy as jnp

    model = model_zoo.build_demo_model(0)
    gen = model.generator
    emb = jax.random.normal(
        jax.random.key(0),
        (2, 16, gen.pipeline.transformer_cfg.caption_channels),
    )
    mask = jnp.ones((2, 16), jnp.int32)
    video = (np.random.rand(9, 736, 1312, 3) * 2 - 1).astype(np.float32)
    frames = gen.generate(
        emb, mask, height=736, width=1312, frame_num=9, seed=0,
        input_video=video, strength=0.8, output_type="pixels",
        sampling_steps=1,
    )
    assert frames.shape == (9, 720, 1280, 3)


def test_ckpt_resolution_subfolder_layout(tmp_path):
    """Files fetched into the hub's subfolder layout under a custom
    --ckpt-dir must resolve (T5 lives in <ckpt_dir>/T5_xxl_1.1/)."""
    sub = tmp_path / "T5_xxl_1.1"
    sub.mkdir()
    name = "T5_xxl_1.1_enc_quanto_bf16_int8.safetensors"
    (sub / name).write_bytes(b"x")
    got = model_zoo._maybe(f"ckpts/T5_xxl_1.1/{name}", str(tmp_path))
    assert got == str(sub / name)
    # flat layout still wins when present
    (tmp_path / name).write_bytes(b"y")
    got = model_zoo._maybe(f"ckpts/T5_xxl_1.1/{name}", str(tmp_path))
    assert got == str(tmp_path / name)


def test_cli_enhance_prompt_flag(tmp_path, monkeypatch, capsys):
    """--enhance-prompt with no enhancer checkpoints behaves like the
    reference's disabled path: the prompt passes through unchanged and
    generation proceeds."""
    monkeypatch.delenv("LTXV_TPU_ENHANCER_LLM_DIR", raising=False)
    monkeypatch.delenv("LTXV_TPU_CAPTIONER_DIR", raising=False)
    out = str(tmp_path / "vid.mp4")
    args = parse_args([
        "--prompt", "a cat", "--demo", "--enhance-prompt",
        "--height", "64", "--width", "64",
        "--video-length", "9", "--num-inference-steps", "2",
        "--output-path", out, "--attention", "xla",
    ])
    path = infer(args)
    assert os.path.isfile(path)
    assert "enhanced prompt" not in capsys.readouterr().out


def test_server_enhance_prompt_field(server):
    """The superset enhance_prompt JSON field: with no enhancer
    checkpoints the prompt passes through unchanged and the request
    still succeeds (the reference's disabled-path behavior)."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    payload = {
        "image": base64.b64encode(buf.getvalue()).decode(),
        "prompt": "a dog",
        "negative_prompt": "",
        "height": 64,
        "width": 64,
        "num_frames": 9,
        "frame_rate": 25,
        "num_inference_steps": 2,
        "enhance_prompt": True,
    }
    req = urllib.request.Request(
        server + "/", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
    assert isinstance(resp, list) and "video" in resp[0]

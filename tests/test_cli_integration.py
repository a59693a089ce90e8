"""End-to-end CLI integration: a synthesized HF-layout checkpoint directory
driven through ``python -m omg_tpu.cli.inference_lora`` — exercising the
loader (geometry from config.json), converter, tokenizers, LoRA loading,
and the two-stage engine exactly as a user would."""

import json
import os
import sys

import jax
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.models import clip as clip_lib
from omg_tpu.models import unet as unet_lib
from omg_tpu.models import vae as vae_lib
from tests.test_convert import _emit_torch_sd


def _write_sd(path, tree):
    from safetensors import numpy as stnp
    sd = {k: np.asarray(v, np.float32) for k, v in _emit_torch_sd(tree).items()}
    stnp.save_file(sd, path)


def _write_tokenizer(folder):
    os.makedirs(folder, exist_ok=True)
    # minimal char-level CLIP BPE vocab; EOS is the max id so argmax
    # pooling matches HF's eos-position pooling
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789,.!?-")
    vocab = {}
    for i, c in enumerate(chars):
        vocab[c] = i
        vocab[c + "</w>"] = len(chars) + i
    vocab["<|startoftext|>"] = 998
    vocab["<|endoftext|>"] = 999
    with open(os.path.join(folder, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(folder, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")


@pytest.fixture(scope="module")
def fake_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("sdxl_ckpt")
    key = jax.random.PRNGKey(0)

    ucfg = cfglib.tiny_unet()
    os.makedirs(root / "unet")
    _write_sd(str(root / "unet" / "diffusion_pytorch_model.safetensors"),
              unet_lib.init_params(key, ucfg))
    with open(root / "unet" / "config.json", "w") as f:
        json.dump({
            "sample_size": ucfg.sample_size,
            "block_out_channels": list(ucfg.block_out_channels),
            "layers_per_block": ucfg.layers_per_block,
            "transformer_layers_per_block":
                list(ucfg.transformer_layers_per_block),
            "attention_head_dim": ucfg.attention_head_dim,
            "cross_attention_dim": ucfg.cross_attention_dim,
            "addition_time_embed_dim": ucfg.addition_time_embed_dim,
            "projection_class_embeddings_input_dim":
                ucfg.projection_class_embeddings_input_dim,
            "norm_num_groups": ucfg.norm_num_groups,
        }, f)

    vcfg = cfglib.tiny_vae()
    os.makedirs(root / "vae")
    _write_sd(str(root / "vae" / "diffusion_pytorch_model.safetensors"),
              vae_lib.init_params(key, vcfg))
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({
            "block_out_channels": list(vcfg.block_out_channels),
            "layers_per_block": vcfg.layers_per_block,
            "norm_num_groups": vcfg.norm_num_groups,
            "scaling_factor": vcfg.scaling_factor,
        }, f)

    t1 = cfglib.tiny_text_encoder()
    os.makedirs(root / "text_encoder")
    _write_sd(str(root / "text_encoder" / "model.safetensors"),
              clip_lib.init_params(key, t1))
    with open(root / "text_encoder" / "config.json", "w") as f:
        json.dump({
            "architectures": ["CLIPTextModel"],
            "vocab_size": t1.vocab_size, "hidden_size": t1.hidden_size,
            "intermediate_size": t1.intermediate_size,
            "num_hidden_layers": t1.num_layers,
            "num_attention_heads": t1.num_heads,
            "hidden_act": t1.hidden_act,
        }, f)

    t2 = cfglib.tiny_text_encoder_2()
    os.makedirs(root / "text_encoder_2")
    _write_sd(str(root / "text_encoder_2" / "model.safetensors"),
              clip_lib.init_params(key, t2))
    with open(root / "text_encoder_2" / "config.json", "w") as f:
        json.dump({
            "architectures": ["CLIPTextModelWithProjection"],
            "vocab_size": t2.vocab_size, "hidden_size": t2.hidden_size,
            "intermediate_size": t2.intermediate_size,
            "num_hidden_layers": t2.num_layers,
            "num_attention_heads": t2.num_heads,
            "hidden_act": t2.hidden_act,
            "projection_dim": t2.projection_dim,
        }, f)

    _write_tokenizer(str(root / "tokenizer"))
    _write_tokenizer(str(root / "tokenizer_2"))
    return str(root)


def test_loader_reads_geometry(fake_checkpoint):
    from omg_tpu import loader
    cfg, params, tok1, tok2 = loader.load_sdxl(fake_checkpoint,
                                               pack=False)
    assert cfg.unet.block_out_channels == (32, 64)
    assert cfg.unet.cross_attention_dim == 48
    assert cfg.vae.block_out_channels == (8, 8, 16, 16)
    assert cfg.text_encoder_2.projection_dim == 16
    ids = tok1(["a cat"])
    assert ids.shape == (1, 77)


def test_load_controlnet_geometry(tmp_path):
    from omg_tpu import loader
    from omg_tpu.models import controlnet as cn_lib
    ccfg = cfglib.tiny_controlnet()
    os.makedirs(tmp_path / "cn")
    _write_sd(str(tmp_path / "cn" / "diffusion_pytorch_model.safetensors"),
              cn_lib.init_params(jax.random.PRNGKey(0), ccfg))
    with open(tmp_path / "cn" / "config.json", "w") as f:
        json.dump({
            "block_out_channels": list(ccfg.unet.block_out_channels),
            "layers_per_block": ccfg.unet.layers_per_block,
            "transformer_layers_per_block":
                list(ccfg.unet.transformer_layers_per_block),
            "attention_head_dim": ccfg.unet.attention_head_dim,
            "cross_attention_dim": ccfg.unet.cross_attention_dim,
            "addition_time_embed_dim": ccfg.unet.addition_time_embed_dim,
            "projection_class_embeddings_input_dim":
                ccfg.unet.projection_class_embeddings_input_dim,
            "norm_num_groups": ccfg.unet.norm_num_groups,
            "conditioning_embedding_out_channels":
                list(ccfg.conditioning_embedding_out_channels),
        }, f)
    cfg, params = loader.load_controlnet(str(tmp_path / "cn"),
                                         dtype=jax.numpy.float32)
    assert cfg.unet.block_out_channels == (32, 64)
    assert cfg.conditioning_embedding_out_channels == (8, 8, 16, 16)
    # forward works with the loaded tree
    import jax.numpy as jnp
    s = cfg.unet.sample_size
    down, mid = cn_lib.apply(
        params, cfg,
        jax.random.normal(jax.random.PRNGKey(1), (1, s, s, 4)),
        jnp.asarray(5),
        jax.random.normal(jax.random.PRNGKey(2),
                          (1, 77, cfg.unet.cross_attention_dim)),
        jax.random.normal(jax.random.PRNGKey(3), (1, s * 8, s * 8, 3)),
        text_embeds=jax.random.normal(jax.random.PRNGKey(4), (1, 16)),
        time_ids=jnp.zeros((1, 6)))
    assert len(down) == 4


def _write_idnet_dir(tmp_path):
    """Tiny IdentityNet/ControlNet checkpoint dir -> its path."""
    from omg_tpu.models import controlnet as cn_lib
    ccfg = cfglib.tiny_controlnet()
    os.makedirs(tmp_path / "idnet")
    _write_sd(str(tmp_path / "idnet" / "diffusion_pytorch_model.safetensors"),
              cn_lib.init_params(jax.random.PRNGKey(0), ccfg))
    with open(tmp_path / "idnet" / "config.json", "w") as f:
        json.dump({
            "block_out_channels": list(ccfg.unet.block_out_channels),
            "layers_per_block": ccfg.unet.layers_per_block,
            "transformer_layers_per_block":
                list(ccfg.unet.transformer_layers_per_block),
            "attention_head_dim": ccfg.unet.attention_head_dim,
            "cross_attention_dim": ccfg.unet.cross_attention_dim,
            "addition_time_embed_dim": ccfg.unet.addition_time_embed_dim,
            "projection_class_embeddings_input_dim":
                ccfg.unet.projection_class_embeddings_input_dim,
            "norm_num_groups": ccfg.unet.norm_num_groups,
            "conditioning_embedding_out_channels":
                list(ccfg.conditioning_embedding_out_channels),
        }, f)
    return str(tmp_path / "idnet")


def _write_adapter_bin(tmp_path, rng):
    """NESTED ip-adapter.bin (the real diffusers layout) at the
    tiny-resampler geometry -> its path."""
    import torch

    from conftest import resampler_torch_sd
    rs = cfglib.tiny_resampler()
    flat = resampler_torch_sd(rs, rng)
    nested = {
        "image_proj": {k.split("image_proj.", 1)[1]: torch.from_numpy(v)
                       for k, v in flat.items()},
        "ip_adapter": {
            f"{li}.to_{kv}_ip.weight": torch.from_numpy(
                rng.standard_normal((8, rs.output_dim)).astype(np.float32))
            for li in (1, 3, 5, 7) for kv in ("k", "v")},
    }
    adapter_path = str(tmp_path / "ip-adapter.bin")
    torch.save(nested, adapter_path)
    return adapter_path


def test_cli_inference_instantid_end_to_end(fake_checkpoint, tmp_path,
                                            monkeypatch):
    """Drives cli.inference_instantid main() end-to-end on fabricated
    tiny checkpoints: IdentityNet dir, a NESTED ip-adapter.bin (the real
    diffusers layout — geometry inferred from its shapes), reference
    face images via .arcface.npy/.kps.npy sidecars (insightface absent),
    and the --cache_interval extension flag."""
    from omg_tpu.cli import inference_instantid

    rng = np.random.default_rng(2)
    idnet_dir = _write_idnet_dir(tmp_path)
    adapter_path = _write_adapter_bin(tmp_path, rng)
    rs = cfglib.tiny_resampler()

    # reference face photo + host-analysis sidecars (the insightface-free
    # path): embedding length == the adapter's own embedding_dim
    import PIL.Image
    ref = str(tmp_path / "face.png")
    PIL.Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(ref)
    np.save(ref + ".arcface.npy",
            rng.standard_normal(rs.embedding_dim).astype(np.float32))
    np.save(ref + ".kps.npy",
            np.array([[10, 12], [22, 12], [16, 18], [12, 24], [20, 24]],
                     np.float32))

    save_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "inference_instantid",
        "--pretrained_model", fake_checkpoint,
        "--controlnet_path", idnet_dir,
        "--face_adapter_path", adapter_path,
        "--prompt", "photo of the man and the woman",
        "--prompt_rewrite",
        f"[photo of the man]-*-[ugly]-*-[{ref}]|"
        f"[photo of the woman]-*-[ugly]-*-[{ref}]",
        "--segment_type", "none",
        "--save_dir", save_dir,
        "--seed", "11",
        "--num_steps", "2",
        "--height", "32", "--width", "32",
        "--cache_interval", "2",
    ])
    inference_instantid.main()
    out = os.path.join(save_dir, "seed_11", "stage-1.png")
    assert os.path.exists(out)
    import PIL.Image as PImage
    assert PImage.open(out).size == (32, 32)


def test_cli_serve_end_to_end(fake_checkpoint, tmp_path, monkeypatch):
    """Drives cli.serve main() — the full arg -> engine -> OMGServer
    construction path (InstantID adapter with inferred resampler
    geometry, IdentityNet dir, engine flags) — then a generate job
    with a per-request cache_interval through the captured server."""
    from omg_tpu.cli import serve as serve_cli
    from omg_tpu.serving.server import OMGServer

    rng = np.random.default_rng(3)
    idnet_dir = _write_idnet_dir(tmp_path)
    adapter_path = _write_adapter_bin(tmp_path, rng)

    captured = {}

    def fake_serve(self, host="127.0.0.1", port=0):
        captured["server"] = self

    monkeypatch.setattr(OMGServer, "serve", fake_serve)
    monkeypatch.setattr(sys, "argv", [
        "serve",
        "--pretrained_sdxl_model", fake_checkpoint,
        "--segment_type", "none",
        "--face_adapter_path", adapter_path,
        "--identitynet_path", idnet_dir,
        "--num_steps", "2",
    ])
    serve_cli.main()
    srv = captured["server"]
    assert srv.instantid is not None
    # geometry came from the checkpoint, not the SDXL preset
    assert (srv.instantid.resampler_cfg.output_dim
            == cfglib.tiny_resampler().output_dim)
    res = srv.submit({"prompt": "photo of a cat",
                      "prompt_rewrite": "[a cat]-*-[ugly]",
                      "height": 32, "width": 32, "steps": 2,
                      "cache_interval": 2, "seed": 4})
    assert res["height"] == 32 and res["image"]


def test_cli_inference_lora_end_to_end(fake_checkpoint, tmp_path,
                                       monkeypatch):
    from omg_tpu.cli import inference_lora
    save_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "inference_lora",
        "--pretrained_sdxl_model", fake_checkpoint,
        "--prompt", "photo of a cat",
        "--negative_prompt", "ugly",
        "--prompt_rewrite", "[a cat]-*-[ugly]",
        "--segment_type", "none",
        "--save_dir", save_dir,
        "--seed", "7",
        "--num_steps", "2",
        "--height", "32", "--width", "32",
    ])
    inference_lora.main()
    out = os.path.join(save_dir, "seed_7", "stage-1.png")
    assert os.path.exists(out)
    import PIL.Image
    img = PIL.Image.open(out)
    assert img.size == (32, 32)

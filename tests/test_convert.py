"""Checkpoint conversion: torch layouts -> TPU-native pytrees.

The CLIP test is a true numeric parity test against the transformers
implementation (the same one the reference runs through diffusers
encode_prompt). UNet/VAE conversion is validated by round-trip (emit a
diffusers-style flat state dict from our tree, convert, compare) since
diffusers itself is not installed in this image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu import convert
from omg_tpu.models import clip as clip_lib
from omg_tpu.models import unet as unet_lib
from omg_tpu.models import vae as vae_lib


# --------------------------------------------------------------------------
# CLIP: numeric parity vs transformers
# --------------------------------------------------------------------------

def _hf_tiny_clip(projection: bool):
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel, CLIPTextModelWithProjection
    hf_cfg = HFConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
        projection_dim=16,
        # real CLIP pools at the first EOS token, which is also the pad
        # token and the max vocab id; keep those invariants in the tiny
        # vocab so our argmax pooling and HF's eos-match pooling agree.
        bos_token_id=1, eos_token_id=999,
    )
    torch.manual_seed(0)
    cls = CLIPTextModelWithProjection if projection else CLIPTextModel
    return cls(hf_cfg).eval()


@pytest.mark.parametrize("projection", [False, True])
def test_clip_matches_transformers(projection):
    import torch
    model = _hf_tiny_clip(projection)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    tree = convert.convert_clip(sd, dtype=jnp.float32)

    cfg = cfglib.tiny_text_encoder(projection_dim=16 if projection else 0)
    ids = np.array([[49406 % 1000, 10, 20, 30, 999] + [999] * 72], np.int64)

    with torch.no_grad():
        hf_out = model(torch.from_numpy(ids), output_hidden_states=True)
    ours = clip_lib.apply(tree, cfg, jnp.asarray(ids, jnp.int32))

    np.testing.assert_allclose(
        np.asarray(ours.last_hidden_state),
        hf_out.last_hidden_state.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ours.penultimate),
        hf_out.hidden_states[-2].numpy(), atol=2e-5)
    if projection:
        np.testing.assert_allclose(
            np.asarray(ours.projected),
            hf_out.text_embeds.numpy(), atol=2e-5)


# --------------------------------------------------------------------------
# UNet / VAE: structural round-trip through diffusers-style keys
# --------------------------------------------------------------------------

def _emit_torch_sd(tree, prefix=""):
    """Inverse of convert: our tree -> diffusers-style flat state dict."""
    sd = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])
        else:
            arr = np.asarray(node)
            # invert name canonicalization
            parts = []
            for tok in path:
                if tok == "net_0_proj":
                    parts += ["net", "0", "proj"]
                elif tok == "net_2":
                    parts += ["net", "2"]
                elif tok == "to_out":
                    parts += ["to_out", "0"]
                else:
                    parts.append(tok)
            # invert layout transform
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)      # HWIO -> OIHW
            elif arr.ndim == 2 and parts[-1] == "weight" and not any(
                    t in convert._EMBEDDING_TABLES for t in parts):
                arr = arr.T
            sd[prefix + ".".join(parts)] = arr

    walk(tree, [])
    return sd


def _assert_tree_equal(a, b, path=""):
    assert type(a) is type(b) or (
        isinstance(a, (list, tuple)) and isinstance(b, (list, tuple))), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   err_msg=path, atol=0)


def test_unet_roundtrip():
    cfg = cfglib.tiny_unet()
    tree = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    sd = _emit_torch_sd(tree)
    back = convert.convert_unet(sd, dtype=jnp.float32)
    _assert_tree_equal(tree, back)


def test_vae_roundtrip():
    cfg = cfglib.tiny_vae()
    tree = vae_lib.init_params(jax.random.PRNGKey(0), cfg)
    sd = _emit_torch_sd(tree)
    back = convert.convert_vae(sd, dtype=jnp.float32)
    _assert_tree_equal(tree, back)


def test_controlnet_roundtrip():
    from omg_tpu.models import controlnet as cn_lib
    cfg = cfglib.tiny_controlnet()
    tree = cn_lib.init_params(jax.random.PRNGKey(0), cfg)
    sd = _emit_torch_sd(tree)
    back = convert.convert_controlnet(sd, dtype=jnp.float32)
    _assert_tree_equal(tree, back)


def test_ip_adapter_bin_layout():
    """InstantID .bin split: image_proj + per-layer to_k_ip/to_v_ip."""
    rng = np.random.default_rng(0)
    sd = {}
    sd["image_proj.latents"] = rng.standard_normal((1, 4, 32)).astype(np.float32)
    sd["image_proj.proj_in.weight"] = rng.standard_normal((32, 16)).astype(np.float32)
    sd["image_proj.proj_in.bias"] = np.zeros((32,), np.float32)
    for i, idx in enumerate([1, 3, 5]):
        sd[f"ip_adapter.{idx}.to_k_ip.weight"] = rng.standard_normal(
            (24, 48)).astype(np.float32)
        sd[f"ip_adapter.{idx}.to_v_ip.weight"] = rng.standard_normal(
            (24, 48)).astype(np.float32)
    out = convert.convert_ip_adapter(sd, dtype=jnp.float32)
    assert len(out["ip_adapter"]) == 3
    assert out["ip_adapter"][0]["to_k_ip"]["weight"].shape == (48, 24)
    assert out["image_proj"]["proj_in"]["weight"].shape == (16, 32)
    assert out["image_proj"]["latents"].shape == (1, 4, 32)


def test_convert_ip_adapter_real_layout():
    """convert_ip_adapter on a checkpoint-shaped state dict INCLUDING the
    Resampler's layers.* keys — the FeedForward Sequential has sparse
    param indices {0, 1, 3} (index 2 is the paramless GELU), which a
    dense-only listify crashed on (KeyError: 2). The converted tree must
    drive resampler.apply end-to-end."""
    import numpy as np

    from omg_tpu import config as cfglib
    from omg_tpu import convert
    from omg_tpu.models import resampler as rs_lib

    cfg = cfglib.tiny_resampler()
    inner = cfg.dim_head * cfg.heads
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd = {
        "image_proj.latents": r(1, cfg.num_queries, cfg.dim),
        "image_proj.proj_in.weight": r(cfg.dim, cfg.embedding_dim),
        "image_proj.proj_in.bias": r(cfg.dim),
        "image_proj.proj_out.weight": r(cfg.output_dim, cfg.dim),
        "image_proj.proj_out.bias": r(cfg.output_dim),
        "image_proj.norm_out.weight": r(cfg.output_dim),
        "image_proj.norm_out.bias": r(cfg.output_dim),
    }
    for i in range(cfg.depth):
        p = f"image_proj.layers.{i}."
        sd.update({
            p + "0.norm1.weight": r(cfg.dim), p + "0.norm1.bias": r(cfg.dim),
            p + "0.norm2.weight": r(cfg.dim), p + "0.norm2.bias": r(cfg.dim),
            p + "0.to_q.weight": r(inner, cfg.dim),
            p + "0.to_kv.weight": r(2 * inner, cfg.dim),
            p + "0.to_out.weight": r(cfg.dim, inner),
            # torch FeedForward Sequential: 0 LayerNorm, 1 Linear,
            # 2 GELU (no params), 3 Linear
            p + "1.0.weight": r(cfg.dim), p + "1.0.bias": r(cfg.dim),
            p + "1.1.weight": r(cfg.dim * cfg.ff_mult, cfg.dim),
            p + "1.3.weight": r(cfg.dim, cfg.dim * cfg.ff_mult),
        })
    # decoupled IP cross-attention halves (layer keys 1, 3, ...)
    for li in (1, 3):
        sd[f"ip_adapter.{li}.to_k_ip.weight"] = r(8, cfg.output_dim)
        sd[f"ip_adapter.{li}.to_v_ip.weight"] = r(8, cfg.output_dim)

    out = convert.convert_ip_adapter(sd, dtype=jnp.float32)
    tree = out["image_proj"]
    ff = tree["layers"][0][1]
    assert ff[2] is None                    # the GELU placeholder
    assert ff[1]["weight"].shape == (cfg.dim, cfg.dim * cfg.ff_mult)

    tokens = rs_lib.apply(tree, cfg, jnp.ones((2, 1, cfg.embedding_dim)))
    assert tokens.shape == (2, cfg.num_queries, cfg.output_dim)
    assert bool(jnp.isfinite(tokens).all())
    assert len(out["ip_adapter"]) == 2


from conftest import resampler_torch_sd as _resampler_torch_sd  # noqa: E402


def test_infer_resampler_cfg_tiny_and_sdxl():
    """Geometry inference from checkpoint shapes (the loaders' policy):
    the tiny preset and the real InstantID preset both round-trip."""
    rng = np.random.default_rng(0)
    for preset in (cfglib.tiny_resampler(), cfglib.instantid_resampler()):
        sd = _resampler_torch_sd(preset, rng)
        got = convert.infer_resampler_cfg(sd)
        for f in ("dim", "depth", "dim_head", "heads", "num_queries",
                  "embedding_dim", "output_dim", "ff_mult"):
            assert getattr(got, f) == getattr(preset, f), (f, got, preset)
    with pytest.raises(ValueError, match="resampler"):
        convert.infer_resampler_cfg({"foo": np.zeros((1,))})


def test_ip_adapter_nested_bin_layout(tmp_path):
    """The real InstantID/IP-Adapter ``.bin`` nests TWO sub-state-dicts
    ({"image_proj": {...}, "ip_adapter": {...}}, the diffusers format) —
    conversion and geometry inference must flatten it, not silently
    produce an empty tree."""
    import torch
    cfg = cfglib.tiny_resampler()
    rng = np.random.default_rng(1)
    flat = _resampler_torch_sd(cfg, rng)
    nested = {
        "image_proj": {k.split("image_proj.", 1)[1]: torch.from_numpy(v)
                       for k, v in flat.items()},
        "ip_adapter": {
            f"{li}.to_{kv}_ip.weight": torch.from_numpy(
                rng.standard_normal((8, cfg.output_dim))
                .astype(np.float32))
            for li in (1, 3) for kv in ("k", "v")},
    }
    path = str(tmp_path / "ip-adapter.bin")
    torch.save(nested, path)
    out = convert.convert_ip_adapter(path, dtype=jnp.float32)
    assert len(out["ip_adapter"]) == 2
    assert out["image_proj"]["latents"].shape == (1, cfg.num_queries,
                                                  cfg.dim)
    got = convert.infer_resampler_cfg(path)
    assert got.output_dim == cfg.output_dim
    assert got.heads == cfg.heads


def test_clip_cfg_architectures_precedence(tmp_path):
    """A declared architectures list decides the projection head; the
    fallback's projection only applies when config.json is silent (the
    old `or` made with_proj always True for text_encoder_2)."""
    import json as _json

    from omg_tpu import config as cfglib
    from omg_tpu import loader

    d = tmp_path / "text_encoder_2"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps({
        "architectures": ["CLIPTextModel"], "hidden_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "intermediate_size": 128}))
    cfg = loader._clip_cfg(str(d), cfglib.sdxl_text_encoder_2(),
                           jnp.float32)
    assert cfg.projection_dim == 0          # architectures wins
    (d / "config.json").write_text(_json.dumps({
        "architectures": ["CLIPTextModelWithProjection"],
        "hidden_size": 64, "projection_dim": 77}))
    cfg = loader._clip_cfg(str(d), cfglib.sdxl_text_encoder_2(),
                           jnp.float32)
    assert cfg.projection_dim == 77

"""DeepCache (branch-0 feature caching) — plumbing and loop tests.

The approximation contract: ``apply_shallow`` fed the cache captured by
``apply(..., return_cache=True)`` at the SAME (sample, t) must reproduce
the full forward bit-exactly — staleness of the cache is the ONLY source
of drift (Ma et al. 2023, arXiv 2312.00858). Reference workload being
accelerated: the per-step UNet calls of
/root/reference/src/pipelines/lora_pipeline.py:485-615.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.models import unet
from omg_tpu.nn.attention import init_ip_kv
from omg_tpu.pipelines import sdxl


def _inputs(cfg, key, b=2, hw=16):
    ks = jax.random.split(key, 5)
    d = cfg.cross_attention_dim
    pdim = cfg.projection_class_embeddings_input_dim - \
        6 * cfg.addition_time_embed_dim
    return dict(
        sample=jax.random.normal(ks[0], (b, hw, hw, 4), cfg.dtype),
        timestep=jnp.asarray(499.0),
        ehs=jax.random.normal(ks[1], (b, 7, d), cfg.dtype),
        text_embeds=jax.random.normal(ks[2], (b, pdim), cfg.dtype),
        time_ids=jnp.tile(jnp.asarray([[16., 16., 0., 0., 16., 16.]]),
                          (b, 1)),
    )


def _full_and_shallow(cfg, params, inp, **kw):
    out_full, cache = unet.apply(
        params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
        text_embeds=inp["text_embeds"], time_ids=inp["time_ids"],
        return_cache=True, **kw)
    out_shallow = unet.apply_shallow(
        params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
        text_embeds=inp["text_embeds"], time_ids=inp["time_ids"],
        cache=cache, **kw)
    return out_full, cache, out_shallow


class TestShallowPlumbing:
    def test_same_step_cache_reproduces_full(self):
        """tiny config (attention-free level 0, like SDXL)."""
        cfg = cfglib.tiny_unet()
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))
        out_full, cache, out_shallow = _full_and_shallow(cfg, params, inp)
        assert cache.shape == unet.cache_shape(cfg, 2, 16, 16)
        np.testing.assert_array_equal(np.asarray(out_full),
                                      np.asarray(out_shallow))

    def test_return_cache_matches_plain_apply(self):
        cfg = cfglib.tiny_unet()
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))
        plain = unet.apply(
            params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
            text_embeds=inp["text_embeds"], time_ids=inp["time_ids"])
        withc, _ = unet.apply(
            params, cfg, inp["sample"], inp["timestep"], inp["ehs"],
            text_embeds=inp["text_embeds"], time_ids=inp["time_ids"],
            return_cache=True)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(withc))

    def test_attentive_shallow_level_with_ip_and_lora(self):
        """Geometry with attention at the shallowest level pins the
        IP-adapter traversal-suffix indexing and the up-block LoRA path:
        a wrong ip_idx or lora subtree would break bit-equality."""
        cfg = cfglib.UNetConfig(
            sample_size=16, block_out_channels=(32, 64),
            layers_per_block=1, transformer_layers_per_block=(1, 2),
            attention_head_dim=8, cross_attention_dim=48,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=16 + 6 * 8,
            norm_num_groups=8, dtype=jnp.float32)
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))

        # per-layer inner dims in attn2 traversal order (down, mid, up)
        widths = []
        for lvl, d in enumerate(cfg.transformer_layers_per_block):
            widths += [cfg.block_out_channels[lvl]] * \
                (cfg.layers_per_block * d)
        widths += [cfg.block_out_channels[-1]] * \
            cfg.transformer_layers_per_block[-1]
        for lvl, d in reversed(
                list(enumerate(cfg.transformer_layers_per_block))):
            widths += [cfg.block_out_channels[lvl]] * \
                ((cfg.layers_per_block + 1) * d)
        assert len(widths) == unet.num_cross_attention_layers(cfg)
        ks = jax.random.split(jax.random.PRNGKey(2), len(widths))
        # distinct per-layer weights: index misalignment changes output
        ip = [init_ip_kv(k, cfg.cross_attention_dim, w)
              for k, w in zip(ks, widths)]
        ip_ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 48))

        kl = jax.random.split(jax.random.PRNGKey(4), 2)
        leaf = {"down": jax.random.normal(kl[0], (32, 4)) * 0.1,
                "up": jax.random.normal(kl[1], (4, 32)) * 0.1,
                "scale": jnp.asarray(1.0)}
        lora = {"down_blocks": {0: {"attentions": {0: {
                    "transformer_blocks": {0: {"attn1": {"to_q": leaf}}}}}}},
                "up_blocks": {1: {"attentions": {1: {
                    "transformer_blocks": {0: {"attn2": {"to_q": leaf}}}}}}}}

        out_full, _, out_shallow = _full_and_shallow(
            cfg, params, inp, ip_adapter=ip, ip_context=ip_ctx,
            ip_scale=0.8, lora=lora)
        np.testing.assert_array_equal(np.asarray(out_full),
                                      np.asarray(out_shallow))

    def test_stale_cache_differs(self):
        """A cache from a different latent must NOT reproduce the full
        forward — guards against apply_shallow ignoring its input."""
        cfg = cfglib.tiny_unet()
        params = unet.init_params(jax.random.PRNGKey(0), cfg)
        inp = _inputs(cfg, jax.random.PRNGKey(1))
        other = _inputs(cfg, jax.random.PRNGKey(9))
        out_full, cache, _ = _full_and_shallow(cfg, params, inp)
        stale = unet.apply_shallow(
            params, cfg, other["sample"], inp["timestep"], other["ehs"],
            text_embeds=other["text_embeds"], time_ids=other["time_ids"],
            cache=cache)
        assert not np.allclose(np.asarray(out_full), np.asarray(stale))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

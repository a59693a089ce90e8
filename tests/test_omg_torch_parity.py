"""END-TO-END two-stage pipeline parity vs a torch re-implementation.

The per-module torch twins (tests/test_unet_torch_parity.py etc.) prove
each submodel matches torch. This test closes the last correctness seam:
the *composition* — the reference's full stage-1/stage-2 denoise loop
with materialized-prob P2P hooks, the step gate, region fusion with mask
normalization, and the CFG-slot writeback
(reference: src/pipelines/lora_pipeline.py:485-615,
src/prompt_attention/p2p_attention.py:124-138) — re-implemented here in
torch from the reference's semantics and run against omg_tpu's fast path
(stage-1 dedup + prefix resume + the 3+2K-lane stage 2) at tiny geometry
with shared noise. Variants: plain, per-concept LoRA, and InstantID
(IP dual cross-attention) — the strongest in-env proxy for the <0.05
LPIPS acceptance target (BASELINE.json) given zero-egress (no weights).

The torch loop deliberately mirrors the REFERENCE layout (4 CFG rows all
50 steps, K sequential concept passes, prob matrices materialized on
every controlled layer), not our fast path — so every fast-path identity
(copy dedup, trajectory feed, lane merge, O(N²)-free P2P) is checked
against the reference formulation in one shot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu import config as cfglib
from omg_tpu.control import p2p
from omg_tpu.diffusion import schedulers
from omg_tpu.models import unet as unet_lib
from omg_tpu.nn.attention import init_ip_kv
from omg_tpu.pipelines import multiconcept, sdxl

torch = pytest.importorskip("torch")

H = W = 32          # pixels; latent 4x4
STEPS = 8
FUSION_START = 2    # fusion active for i > 2 (reference: i > 15 of 50)
GUIDANCE = 7.5
IP_SCALE = 0.8


# --------------------------------------------------------------------------
# torch primitives (independent re-implementations, diffusers semantics)
# --------------------------------------------------------------------------

def t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _sub(tree, key):
    """None-propagating descent mirroring unet._sub (for LoRA trees)."""
    if tree is None:
        return None
    if isinstance(key, int):
        if isinstance(tree, (list, tuple)):
            return tree[key] if key < len(tree) else None
        return tree.get(key) if isinstance(tree, dict) else None
    return tree.get(key) if isinstance(tree, dict) else None


def lin(p, x, lora=None):
    y = x @ t(p["weight"])
    if lora is not None:
        y = y + float(lora["scale"]) * ((x @ t(lora["down"])) @ t(lora["up"]))
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def conv(p, x, stride=1, padding=1):
    w = t(p["weight"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = t(p["bias"]) if "bias" in p else None
    return torch.nn.functional.conv2d(x, w, b, stride=stride, padding=padding)


def gn(p, x, groups):
    return torch.nn.functional.group_norm(x, groups, t(p["weight"]),
                                          t(p["bias"]), eps=1e-5)


def ln(p, x):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                          t(p["weight"]), t(p["bias"]))


def resnet(p, x, temb, groups):
    h = torch.nn.functional.silu(gn(p["norm1"], x, groups))
    h = conv(p["conv1"], h)
    tproj = lin(p["time_emb_proj"], torch.nn.functional.silu(temb))
    h = h + tproj[:, :, None, None]
    h = torch.nn.functional.silu(gn(p["norm2"], h, groups))
    h = conv(p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv(p["conv_shortcut"], x, padding=0)
    return x + h


class TorchController:
    """Reference-faithful P2P prob edit (p2p_attention.py:124-138).

    Operates on [4, heads, Nq, Nk] probs = [unc_A, unc_B, cond_A, cond_B]:
    the conditional half's copy-B row is rewritten from copy-A's —
    cross-attn via the mapper/alpha blend (:131-134,146-147), self-attn
    by full replacement inside the step window for layers whose query
    length fits the resolution gate (:114-118,126).
    """

    def __init__(self, mapper, cross_alpha, self_start, self_end, seq_limit):
        self.mapper = t(mapper)
        self.cross_alpha = t(cross_alpha)       # [S+1, 77]
        self.self_start = self_start
        self.self_end = self_end
        self.seq_limit = seq_limit

    def at_step(self, i):
        def hook(probs, is_cross):
            probs = probs.clone()
            base, repl = probs[2], probs[3]
            if is_cross:
                nk = probs.shape[-1]
                alpha = self.cross_alpha[i][:nk]
                proj = torch.einsum("hpw,wn->hpn", base,
                                    self.mapper[:nk, :nk])
                probs[3] = proj * alpha + (1.0 - alpha) * repl
            elif (probs.shape[2] <= self.seq_limit
                  and self.self_start <= i < self.self_end):
                probs[3] = base
            return probs
        return hook


class _Ctx:
    """Per-forward plumbing (context, lora, hook, ip list + counter)."""

    def __init__(self, context, lora, hook, ip_list, ip_ctx, ip_scale):
        self.context = context
        self.lora = lora
        self.hook = hook
        self.ip_list = ip_list
        self.ip_ctx = ip_ctx
        self.ip_scale = ip_scale
        self.ip_idx = 0


def attention(p, x, ctx_tokens, heads, lora, hook, is_cross,
              ip_p=None, ip_ctx=None, ip_scale=1.0):
    q = lin(p["to_q"], x, _sub(lora, "to_q"))
    k = lin(p["to_k"], ctx_tokens, _sub(lora, "to_k"))
    v = lin(p["to_v"], ctx_tokens, _sub(lora, "to_v"))
    b, n, c = q.shape
    hd = c // heads

    def split(a):
        return a.reshape(b, a.shape[1], heads, hd).transpose(1, 2)

    qh, kh, vh = split(q), split(k), split(v)
    scores = qh @ kh.transpose(-1, -2) * (hd ** -0.5)
    probs = torch.softmax(scores, dim=-1)
    if hook is not None:
        probs = hook(probs, is_cross)
    out = probs @ vh
    if ip_p is not None and ip_ctx is not None:
        k_ip = split(lin(ip_p["to_k_ip"], ip_ctx))
        v_ip = split(lin(ip_p["to_v_ip"], ip_ctx))
        ip_probs = torch.softmax(
            qh @ k_ip.transpose(-1, -2) * (hd ** -0.5), dim=-1)
        out = out + ip_scale * (ip_probs @ v_ip)
    out = out.transpose(1, 2).reshape(b, n, c)
    return lin(p["to_out"], out, _sub(lora, "to_out"))


def transformer(p, x, ctx, head_dim, groups, lora):
    b, c, hh, ww = x.shape
    heads = c // head_dim
    res = x
    h = gn(p["norm"], x, groups)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = lin(p["proj_in"], h, _sub(lora, "proj_in"))
    tlora = _sub(lora, "transformer_blocks")
    for bi, blk in enumerate(p["transformer_blocks"]):
        blora = _sub(tlora, bi)
        hb = ln(blk["norm1"], h)
        h = h + attention(blk["attn1"], hb, hb, heads,
                          _sub(blora, "attn1"), ctx.hook, False)
        hb = ln(blk["norm2"], h)
        ip_p = None
        if ctx.ip_list is not None:
            ip_p = ctx.ip_list[ctx.ip_idx]
            ctx.ip_idx += 1
        h = h + attention(blk["attn2"], hb, ctx.context, heads,
                          _sub(blora, "attn2"), ctx.hook, True,
                          ip_p=ip_p, ip_ctx=ctx.ip_ctx,
                          ip_scale=ctx.ip_scale)
        hb = ln(blk["norm3"], h)
        flora = _sub(blora, "ff")
        ff = lin(blk["ff"]["net_0_proj"], hb, _sub(flora, "net_0_proj"))
        a, gate = ff.chunk(2, dim=-1)
        h = h + lin(blk["ff"]["net_2"],
                    a * torch.nn.functional.gelu(gate),
                    _sub(flora, "net_2"))
    h = lin(p["proj_out"], h, _sub(lora, "proj_out"))
    return h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res


def timestep_embedding(ts, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = ts[:, None].float() * freqs
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_unet(p, cfg, sample, timestep, ehs, pooled, time_ids, *,
               lora=None, hook=None, ip_list=None, ip_ctx=None,
               ip_scale=1.0):
    groups = cfg.norm_num_groups
    hd = cfg.attention_head_dim
    b = sample.shape[0]
    ctx = _Ctx(ehs, lora, hook, ip_list, ip_ctx, ip_scale)

    temb = timestep_embedding(torch.full((b,), float(timestep)),
                              cfg.block_out_channels[0])
    te = p["time_embedding"]
    temb = lin(te["linear_2"],
               torch.nn.functional.silu(lin(te["linear_1"], temb)))
    ids = time_ids.reshape(-1)
    id_emb = timestep_embedding(ids, cfg.addition_time_embed_dim)
    id_emb = id_emb.reshape(b, -1)
    add = torch.cat([pooled, id_emb], dim=-1)
    ae = p["add_embedding"]
    temb = temb + lin(ae["linear_2"],
                      torch.nn.functional.silu(lin(ae["linear_1"], add)))

    x = conv(p["conv_in"], sample)
    skips = [x]
    dlora = _sub(lora, "down_blocks")
    for bi, blk in enumerate(p["down_blocks"]):
        blora = _sub(dlora, bi)
        attns = blk.get("attentions")
        for ri, res in enumerate(blk["resnets"]):
            x = resnet(res, x, temb, groups)
            if attns:
                x = transformer(attns[ri], x, ctx, hd, groups,
                                _sub(_sub(blora, "attentions"), ri))
            skips.append(x)
        if "downsamplers" in blk:
            x = conv(blk["downsamplers"][0]["conv"], x, stride=2)
            skips.append(x)

    mid = p["mid_block"]
    mlora = _sub(lora, "mid_block")
    x = resnet(mid["resnets"][0], x, temb, groups)
    if mid["attentions"]:
        x = transformer(mid["attentions"][0], x, ctx, hd, groups,
                        _sub(_sub(mlora, "attentions"), 0))
    x = resnet(mid["resnets"][1], x, temb, groups)

    ulora = _sub(lora, "up_blocks")
    for bi, blk in enumerate(p["up_blocks"]):
        blora = _sub(ulora, bi)
        attns = blk.get("attentions")
        for ri, res in enumerate(blk["resnets"]):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = resnet(res, x, temb, groups)
            if attns:
                x = transformer(attns[ri], x, ctx, hd, groups,
                                _sub(_sub(blora, "attentions"), ri))
        if "upsamplers" in blk:
            x = torch.nn.functional.interpolate(x, scale_factor=2,
                                                mode="nearest")
            x = conv(blk["upsamplers"][0]["conv"], x)

    x = torch.nn.functional.silu(gn(p["conv_norm_out"], x, groups))
    return conv(p["conv_out"], x)


# --------------------------------------------------------------------------
# torch two-stage loop, faithful to the reference
# (lora_pipeline.py:485-615: 4 CFG rows, per-step hooks, step-gated
#  region fusion with K sequential concept passes, euler steps)
# --------------------------------------------------------------------------

def torch_two_stage(params, cfg, sched, noise_nhwc, embeds4, pooled4, tids4,
                    concepts, masks_lat, controller, *, stage):
    sigmas = np.asarray(sched.sigmas, np.float64)
    timesteps = np.asarray(sched.timesteps)
    init_sigma = float(np.asarray(sched.init_noise_sigma))

    lat0 = t(noise_nhwc).permute(0, 3, 1, 2) * init_sigma   # [1, 4, h, w]
    lat = torch.cat([lat0, lat0])                           # copies A, B
    e4 = t(embeds4)
    p4 = t(pooled4)
    ti4 = t(tids4)
    masks_t = t(masks_lat)[:, None] if masks_lat is not None else None

    with torch.no_grad():
        for i in range(sched.num_steps):
            ts = timesteps[i]
            s = float(sigmas[i])
            lin4 = torch.cat([lat, lat]) / math.sqrt(s * s + 1.0)
            eps = torch_unet(params, cfg, lin4, ts, e4, p4, ti4,
                             hook=controller.at_step(i))
            if stage == 2 and i > FUSION_START:
                union = (masks_t.sum(0, keepdim=True) > 0)[0]
                edit = eps[[1, 3]].clone()
                new = torch.where(union, torch.zeros_like(edit), edit)
                for c in concepts:
                    m = masks_t[c["k"]]
                    rl = lin4[3:4].expand(2, -1, -1, -1)
                    ceps = torch_unet(
                        params, cfg, rl, ts, t(c["embeds"]), t(c["pooled"]),
                        t(c["tids"]), lora=c.get("lora"),
                        ip_list=c.get("ip_list"),
                        ip_ctx=(t(c["ip_ctx"]) if c.get("ip_ctx") is not None
                                else None),
                        ip_scale=IP_SCALE)
                    safe = torch.where(m == 1, m, torch.ones_like(m))
                    new = new + torch.where(m == 1, ceps / safe,
                                            torch.zeros_like(ceps))
                eps = eps.clone()
                eps[1] = new[0]
                eps[3] = new[1]
            guided = eps[:2] + GUIDANCE * (eps[2:] - eps[:2])
            lat = lat + guided * float(sigmas[i + 1] - sigmas[i])
    return lat.permute(0, 2, 3, 1).numpy()                  # NHWC [2, ...]


# --------------------------------------------------------------------------
# shared fixtures
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    cfg = cfglib.tiny_unet()
    params = unet_lib.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(42)
    lh, lw = H // 8, W // 8

    noise = rng.standard_normal((1, lh, lw, 4)).astype(np.float32)

    def cfg_pair(d_embed, d_pool):
        pos = rng.standard_normal((1, 77, d_embed)).astype(np.float32)
        neg = rng.standard_normal((1, 77, d_embed)).astype(np.float32)
        ppos = rng.standard_normal((1, d_pool)).astype(np.float32)
        pneg = rng.standard_normal((1, d_pool)).astype(np.float32)
        return pos, ppos, neg, pneg

    tids = np.asarray(sdxl.add_time_ids((H, W), (0, 0), (H, W)))
    bp, bpp, bn, bnp_ = cfg_pair(cfg.cross_attention_dim, 16)
    base_inputs = multiconcept.make_base_inputs(
        jnp.asarray(bp), jnp.asarray(bpp), jnp.asarray(bn),
        jnp.asarray(bnp_), jnp.asarray(tids), GUIDANCE)

    # overlapping masks on the 4x4 latent: concept 0 cols 0-2, concept 1
    # cols 2-3 -> column 2 is shared (the reference's += accumulation)
    masks = np.zeros((2, lh, lw), np.float32)
    masks[0, :, :3] = 1.0
    masks[1, :, 2:] = 1.0

    concepts_np = []
    for k in range(2):
        cp, cpp, cn_, cnp_ = cfg_pair(cfg.cross_attention_dim, 16)
        concepts_np.append(dict(
            k=k,
            embeds=np.concatenate([cn_, cp]),
            pooled=np.concatenate([cnp_, cpp]),
            tids=np.tile(tids, (2, 1))))

    # controller: identity mapper (equal prompts), cross replace all
    # steps, self replace for i in [0, 0.75*S), resolution gate covering
    # the tiny 2x2=4-token attention layers (reference gate:
    # seq <= width*height, p2p_attention.py:114-118)
    ctl = p2p.P2PControl.build(["a", "a"], STEPS, cross_replace_steps=1.0,
                               self_replace_steps=0.75, width=2, height=2)
    torch_ctl = TorchController(np.asarray(ctl.mapper),
                                np.asarray(ctl.cross_alpha),
                                ctl.self_start, ctl.self_end,
                                ctl.self_seq_limit)

    sched = schedulers.make_schedule("euler", STEPS)
    return dict(cfg=cfg, params=params, noise=noise, sched=sched,
                base_inputs=base_inputs, masks=masks,
                concepts_np=concepts_np, ctl=ctl, torch_ctl=torch_ctl,
                tids=tids)


def _jax_two_stage(s, concept_loras, ip_adapters=(), ip_ctxs=(None, None)):
    cis = []
    for k, c in enumerate(s["concepts_np"]):
        ic = ip_ctxs[k]
        cis.append(multiconcept.ConceptInputs(
            prompt_embeds=jnp.asarray(c["embeds"]),
            text_embeds=jnp.asarray(c["pooled"]),
            time_ids=jnp.asarray(c["tids"]),
            ip_context=(jnp.asarray(ic) if ic is not None else None)))
    sdxl_cfg = sdxl.SDXLConfig(s["cfg"], cfglib.tiny_vae(),
                               cfglib.tiny_text_encoder(),
                               cfglib.tiny_text_encoder_2())
    lat1, cache = multiconcept.sample_stage1_cached(
        sdxl_cfg, s["sched"], s["params"], key=jax.random.PRNGKey(0),
        height=H, width=W, base_inputs=s["base_inputs"],
        fusion_start=FUSION_START, initial_noise=s["noise"])
    lat2 = multiconcept.sample_stage2_resumed(
        sdxl_cfg, s["sched"], s["params"], cache,
        base_inputs=s["base_inputs"], controller=s["ctl"],
        concept_inputs=cis, concept_loras=list(concept_loras),
        masks=jnp.asarray(s["masks"]), fusion_start=FUSION_START,
        concept_ip_adapters=list(ip_adapters), ip_scale=IP_SCALE)
    return np.asarray(lat1), np.asarray(lat2)


def _torch_concepts(s, loras=(None, None), ip_lists=(None, None),
                    ip_ctxs=(None, None)):
    out = []
    for k, c in enumerate(s["concepts_np"]):
        d = dict(c)
        d["lora"] = loras[k]
        d["ip_list"] = ip_lists[k]
        d["ip_ctx"] = ip_ctxs[k]
        out.append(d)
    return out


def _assert_close(got, want, what, atol):
    np.testing.assert_allclose(got, want, rtol=0, atol=atol,
                               err_msg=what)


def _embeds4(s):
    bi = s["base_inputs"]
    return (np.asarray(bi.prompt_embeds), np.asarray(bi.text_embeds),
            np.asarray(bi.time_ids))


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def test_two_stage_matches_torch_reference_loop(setup):
    """Plain 2-concept OMG (BASELINE config #2, no adapters)."""
    s = setup
    e4, p4, t4 = _embeds4(s)
    want1 = torch_two_stage(s["params"], s["cfg"], s["sched"], s["noise"],
                            e4, p4, t4, _torch_concepts(s), s["masks"],
                            s["torch_ctl"], stage=1)
    want2 = torch_two_stage(s["params"], s["cfg"], s["sched"], s["noise"],
                            e4, p4, t4, _torch_concepts(s), s["masks"],
                            s["torch_ctl"], stage=2)
    got1, got2 = _jax_two_stage(s, (None, None))
    scale = np.abs(want2).max()
    _assert_close(got1, want1, "stage-1 latents", atol=2e-3 * scale)
    _assert_close(got2, want2, "stage-2 latents", atol=2e-3 * scale)
    # sanity: fusion actually changed copy B
    assert np.abs(want2[1] - want1[1]).max() > 1e-3


def test_two_stage_matches_torch_with_concept_loras(setup):
    """Per-concept LoRA deltas on q/v/ff projections (the reference's
    set_adapters path, lora_pipeline.py:588-599)."""
    s = setup
    rng = np.random.default_rng(7)

    def leaf(din, dout, r=2):
        return {"down": jnp.asarray(
                    rng.standard_normal((din, r)).astype(np.float32) * 0.3),
                "up": jnp.asarray(
                    rng.standard_normal((r, dout)).astype(np.float32) * 0.3),
                "scale": jnp.asarray(0.8, jnp.float32)}

    c = s["cfg"].block_out_channels[-1]          # 64
    xd = s["cfg"].cross_attention_dim            # 48
    lora0 = {"mid_block": {"attentions": [{"transformer_blocks": [{
        "attn2": {"to_q": leaf(c, c), "to_k": leaf(xd, c)},
        "attn1": {"to_v": leaf(c, c)},
        "ff": {"net_0_proj": leaf(c, c * 8)},
    }]}]}}
    lora1 = {"up_blocks": [{"attentions": [None, {"transformer_blocks": [{
        "attn2": {"to_v": leaf(xd, c)},
    }]}]}]}

    def to_np(tree):
        return jax.tree.map(lambda x: np.asarray(x), tree)

    e4, p4, t4 = _embeds4(s)
    want2 = torch_two_stage(
        s["params"], s["cfg"], s["sched"], s["noise"], e4, p4, t4,
        _torch_concepts(s, loras=(to_np(lora0), to_np(lora1))),
        s["masks"], s["torch_ctl"], stage=2)
    got1, got2 = _jax_two_stage(s, (lora0, lora1))
    scale = np.abs(want2).max()
    _assert_close(got2, want2, "stage-2 latents (LoRA)",
                  atol=2e-3 * scale)
    # LoRA-less run must differ (the adapters did something)
    _, got2_plain = _jax_two_stage(s, (None, None))
    assert np.abs(got2 - got2_plain).max() > 1e-3


def test_two_stage_matches_torch_instantid(setup):
    """InstantID IP dual cross-attention on the concept passes
    (reference: instantid_pipeline.py:618-683 without IdentityNet —
    the ControlNet twin is covered by test_controlnet_torch_parity)."""
    s = setup
    rng = np.random.default_rng(11)
    n_layers = unet_lib.num_cross_attention_layers(s["cfg"])
    inner = s["cfg"].block_out_channels[-1]      # all attn2 at dim 64
    ip_layers = [init_ip_kv(jax.random.PRNGKey(100 + i),
                            s["cfg"].cross_attention_dim, inner)
                 for i in range(n_layers)]
    T = 4
    ip_ctxs = []
    for k in range(2):
        pos = rng.standard_normal((1, T, s["cfg"].cross_attention_dim))
        ip_ctxs.append(np.concatenate(
            [np.zeros_like(pos), pos]).astype(np.float32))  # CFG-zeros

    ip_np = [jax.tree.map(lambda x: np.asarray(x), l) for l in ip_layers]
    e4, p4, t4 = _embeds4(s)
    want2 = torch_two_stage(
        s["params"], s["cfg"], s["sched"], s["noise"], e4, p4, t4,
        _torch_concepts(s, ip_lists=(ip_np, ip_np), ip_ctxs=tuple(ip_ctxs)),
        s["masks"], s["torch_ctl"], stage=2)
    got1, got2 = _jax_two_stage(s, (None, None), ip_adapters=(ip_layers,),
                                ip_ctxs=tuple(ip_ctxs))
    scale = np.abs(want2).max()
    _assert_close(got2, want2, "stage-2 latents (InstantID)",
                  atol=2e-3 * scale)
    # the image tokens must actually influence the output
    _, got2_plain = _jax_two_stage(s, (None, None))
    assert np.abs(got2 - got2_plain).max() > 1e-3

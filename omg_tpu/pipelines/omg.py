"""High-level OMG pipeline: the user-facing two-stage engine.

Plays the role of the reference's entry-point orchestration
(reference: inference_lora.py:226-323): build conditioning, run stage 1,
detect+segment per-concept masks on the stage-1 image, re-run the same
seed as stage 2 with region fusion, decode.

Heavy compute (text encoding, both denoise stages, VAE decode) is jitted;
this class only does host-side orchestration — tokenization, the
prompt_rewrite DSL, mask-provider calls, and PRNG key handling.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omg_tpu import lora as lora_lib
from omg_tpu import rewrite
from omg_tpu.config import ControlNetConfig, ResamplerConfig
from omg_tpu.control import p2p, regions as regions_lib
from omg_tpu.diffusion import schedulers
from omg_tpu.pipelines import multiconcept, sdxl

Array = jax.Array

# mask_provider(image_uint8 [H, W, 3], class_text) -> [H, W] {0,1} or None
MaskProvider = Callable[[np.ndarray, str], Optional[np.ndarray]]


@dataclasses.dataclass
class GenerationResult:
    stage1: np.ndarray                  # [2, H, W, 3] uint8 (copy A, B)
    stage2: Optional[np.ndarray]        # same, or None if no masks found
    masks: List[Optional[np.ndarray]]   # per-concept pixel masks

    @property
    def image(self) -> np.ndarray:
        """The deliverable: copy B of the last stage (reference saves
        image[1], e.g. gradio returns image[1] at app.py:467)."""
        out = self.stage2 if self.stage2 is not None else self.stage1
        return out[1]


@dataclasses.dataclass
class InstantIDModels:
    """Identity stack: Resampler + per-layer IP K/V + IdentityNet."""
    resampler_cfg: ResamplerConfig
    resampler_params: dict
    ip_adapter_layers: list             # [{to_k_ip, to_v_ip}] attn2 order
    identitynet_params: Optional[dict] = None
    identitynet_cfg: Optional[ControlNetConfig] = None
    ip_scale: float = 0.8
    identitynet_scale: float = 0.8


@dataclasses.dataclass
class OMG:
    """The OMG engine over one SDXL weight set."""

    cfg: sdxl.SDXLConfig
    params: sdxl.SDXLParams
    tokenizer: object                   # text.tokenizer.Tokenizer (enc 1)
    tokenizer_2: object                 # (enc 2)
    mask_provider: Optional[MaskProvider] = None
    cn_cfg: Optional[ControlNetConfig] = None
    scheduler: str = "euler"
    num_steps: int = 50
    # Concept-LoRA strength on concept UNet passes (reference:
    # cross_attention_kwargs={'scale': 0.8}, lora_pipeline.py:596).
    concept_lora_scale: float = 0.8
    # set_adapters([char, style], [0.7, 0.5]) mix (reference :589).
    char_style_weights: tuple = (0.7, 0.5)
    # "int8": quantize the UNet's transformer GEMMs for serving
    # (opt-in approximate W8A8 mode, ops/quant.py; default exact bf16).
    quantize: str = ""
    # Opt-in approximate mode: stage-2 concept lanes on vertical strips
    # (multiconcept._denoise_mc_range_traj_cropped). Falls back to the
    # exact program per-request when ControlNets are in play; the
    # vmapped generate_batch path always runs exact.
    concept_crop: bool = False
    # Opt-in approximate mode: DeepCache branch-0 feature caching
    # (models/unet.py:apply_shallow) — a full UNet forward every
    # cache_interval-th step, an attention-free shallow resume
    # otherwise, in BOTH stages. 0/1 = off (exact). Composable with any
    # scheduler (incl. LCM few-step); exclusive with mesh/concept_crop.
    cache_interval: int = 0
    # NON-UNIFORM DeepCache (Ma et al. 2312.00858 §3): how the full
    # steps implied by cache_interval are placed. "uniform" = the
    # modulo schedule; "front" = the same NUMBER of full steps packed
    # toward step 0 (where the trajectory moves fastest) with the
    # fusion-start step forced full — same latency, lower drift
    # (multiconcept.deepcache_schedule). Per-request override via the
    # "cache_schedule" job field.
    cache_schedule: str = "uniform"
    # Multi-chip LATENCY layout (the v5e-8 < 5 s mode, PARITY.md §6): a
    # jax.sharding.Mesh with axes (data, model). generate() then runs
    # stage 1 SPATIALLY sharded — CFG lanes over the data axis, the
    # latent's H axis over the model axis, weights replicated, with the
    # sequence-sharded flash kernel (multiconcept._spatial_ctx) — and
    # stage 2 lane-parallel: the 4+2K lane batch one-lane-per-chip over
    # a flat mesh, with the flash kernel and the P2P row edits under
    # shard_map. The VAE decode is H-sharded too. This is the
    # engine-level successor of the reference's cross-device
    # base/concept placement (lora_pipeline.py:583,601,605). None =
    # single chip. Build with parallel.mesh.make_mesh(8, data=2).
    mesh: Optional[object] = None

    def __post_init__(self):
        if self.cache_schedule not in multiconcept.DEEPCACHE_SCHEDULES:
            raise ValueError(
                f"unknown cache_schedule {self.cache_schedule!r} "
                f"(one of {multiconcept.DEEPCACHE_SCHEDULES})")
        if self.quantize == "int8":
            from omg_tpu.ops.quant import quantize_unet_params
            self.params = self.params._replace(
                unet=quantize_unet_params(self.params.unet))
        elif self.quantize:
            raise ValueError(f"unknown quantize mode {self.quantize!r}")
        if self.mesh is not None and self.concept_crop:
            raise ValueError(
                "concept_crop and mesh are mutually exclusive (the "
                "strip program is single-chip; the lane-parallel mode "
                "keeps the power-of-two 4+2K layout)")
        if self.cache_interval > 1 and self.concept_crop:
            raise ValueError(
                "cache_interval is exclusive with concept_crop (the "
                "strip program has no shallow variant); it composes "
                "with mesh — the shallow path spatially shards in "
                "stage 1 and the per-lane cache shards with the lanes "
                "in stage 2")

    # --------------------------------------------------- mesh placements

    def _mesh_placements(self):
        """Lazy per-engine placements for the latency layout:
        (rep_params, lane_sharding, spatial_sharding).

        ONE replicated weight copy serves both stages. Stage 1 is
        SPATIALLY sharded — the two CFG lanes over the mesh's data axis,
        the latent's H axis over the model axis — so every conv/GEMM is
        token-parallel with replicated weights and the only per-layer
        collective is the self-attention K/V all-gather (SDXL's head
        counts of 10/20 do not divide a 4-way model axis, so Megatron
        head-TP is NOT the right layout here; token sharding splits all
        FLOPs evenly regardless). Stage 2 is lane-parallel: the 4+2K
        lane batch one-lane-per-chip over a flat mesh."""
        if getattr(self, "_placements", None) is not None:
            return self._placements
        from jax.sharding import NamedSharding, PartitionSpec as P

        from omg_tpu.parallel import mesh as mesh_lib

        devices = list(self.mesh.devices.reshape(-1))
        flat = mesh_lib.make_mesh(len(devices), data=len(devices),
                                  model=1, devices=devices)
        rep = NamedSharding(flat, P())
        rep_params = jax.tree.map(
            lambda x: jax.device_put(x, rep), self.params.unet)
        # drop the original placement so chip 0 doesn't hold TWO full
        # UNet copies (~5 GB each at SDXL bf16 on a 16 GB v5e); every
        # engine path works off the replicated tree from here on
        self.params = self.params._replace(unet=rep_params)
        lane_sharding = NamedSharding(flat, P(mesh_lib.DATA_AXIS))
        spatial_sharding = NamedSharding(
            self.mesh, P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS))
        self._placements = (rep_params, lane_sharding, spatial_sharding)
        return self._placements

    # ---------------------------------------------------------------- text

    def encode(self, prompt: str, negative: str, te_lora: tuple = (None, None)):
        """``te_lora``: (encoder-1, encoder-2) LoRA delta trees — the
        reference encodes region prompts with the concept's text-encoder
        adapters active (PEFT set_adapters covers both TEs)."""
        ids1 = jnp.asarray(self.tokenizer([prompt]))
        ids2 = jnp.asarray(self.tokenizer_2([prompt]))
        nids1 = jnp.asarray(self.tokenizer([negative]))
        nids2 = jnp.asarray(self.tokenizer_2([negative]))
        ep, pp = sdxl.encode_tokens(self.cfg, self.params, ids1, ids2,
                                    te_lora[0], te_lora[1])
        en, pn = sdxl.encode_tokens(self.cfg, self.params, nids1, nids2,
                                    te_lora[0], te_lora[1])
        return ep, pp, en, pn

    def _token_in_prompt(self, word: str, prompt: str) -> bool:
        """Reference's mask gate: run detection for 'man'/'woman' only if
        the word's token appears in the global prompt
        (inference_lora.py:276-283)."""
        wid = self.tokenizer.encode_word(word)
        ids = self.tokenizer.encode(prompt)
        return wid in list(ids[1:-1])

    # --------------------------------------------------------- deepcache

    def _resolve_cache_spec(self, cache_interval, cache_schedule,
                            steps: int, fusion_start: int):
        """Per-request DeepCache spec -> the STATIC value the jitted
        programs key on: 0 (exact), an int interval > 1 (uniform), or a
        per-step bool tuple (non-uniform schedule). None falls back to
        the engine defaults; <=1 normalizes to 0 so an explicit "1"
        (or "0" on a DeepCache engine) shares the exact program's jit
        key instead of recompiling a bit-identical one."""
        if isinstance(cache_interval, (tuple, list)):
            # explicit per-step schedule (advanced callers/tests)
            spec = tuple(bool(b) for b in cache_interval)
            if len(spec) != steps:
                raise ValueError(
                    f"cache_interval schedule has {len(spec)} entries "
                    f"for {steps} steps")
            return spec
        interval = (self.cache_interval if cache_interval is None
                    else int(cache_interval))
        if interval <= 1:
            return 0
        kind = (cache_schedule or self.cache_schedule or "uniform")
        if kind == "uniform":
            return interval
        return multiconcept.deepcache_schedule(
            steps, interval, kind=kind, fusion_start=fusion_start)

    # --------------------------------------------------------------- masks

    def _predict_masks(self, image, prompt: str, n_regions: int,
                       detection_classes) -> list:
        """Per-concept masks from the stage-1 image. Token-gated per
        class (reference semantics, inference_lora.py:276-283). All
        gated classes are queried in ONE ``masks_for`` call when the
        provider supports it (SamMaskProvider over OpenVocabDetector:
        joint global-max class assignment, no query-order stealing);
        per-class callables keep the old sequential path."""
        gated = [(k, detection_classes[k])
                 for k in range(n_regions)
                 if k < len(detection_classes) and detection_classes[k]
                 and self.mask_provider is not None
                 and self._token_in_prompt(detection_classes[k], prompt)]
        masks: list = [None] * n_regions
        if not gated:
            return masks
        mf = getattr(self.mask_provider, "masks_for", None)
        if mf is not None:
            for (k, _), m in zip(gated, mf(image, [c for _, c in gated])):
                masks[k] = m
        else:
            for k, cls in gated:
                masks[k] = self.mask_provider(image, cls)
        return masks

    # ------------------------------------------------------------ generate

    def generate(self, prompt: str, *, negative_prompt: str = "",
                 prompt_rewrite: str = "",
                 concept_loras: Sequence[Optional[dict]] = (),
                 style_lora: Optional[dict] = None,
                 seed: int = 14, height: int = 1024, width: int = 1024,
                 guidance_scale: float = 7.5,
                 num_steps: Optional[int] = None,
                 detection_classes: Sequence[str] = ("man", "woman"),
                 spatial_condition: Optional[np.ndarray] = None,
                 controlnet_params: Optional[dict] = None,
                 controlnet_scale: float = 1.0,
                 control_guidance_start: float = 0.0,
                 control_guidance_end: float = 1.0,
                 controlnet_guess_mode: bool = False,
                 instantid: Optional[InstantIDModels] = None,
                 face_embeddings: Sequence[Optional[np.ndarray]] = (),
                 face_kps_image: Optional[np.ndarray] = None,
                 face_kps_provider=None,
                 masks: Optional[Sequence[Optional[np.ndarray]]] = None,
                 fusion_start: Optional[int] = None,
                 initial_noise: Optional[np.ndarray] = None,
                 scheduler: Optional[str] = None,
                 cache_interval: Optional[int] = None,
                 cache_schedule: Optional[str] = None,
                 ) -> GenerationResult:
        steps = num_steps or self.num_steps
        if fusion_start is None:
            # reference gate: i > 15 of 50 steps (lora_pipeline.py:568);
            # scale the same 30% warmup fraction to other step counts.
            fusion_start = round(steps * regions_lib.FUSION_START_STEP / 50)
        # per-request scheduler override (e.g. LCM few-step requests on
        # an euler-default server; the microbatcher buckets by it)
        sched = schedulers.make_schedule(scheduler or self.scheduler, steps)
        # per-request DeepCache override (same pattern as scheduler:
        # None -> the engine default; the microbatcher buckets by it)
        eff_interval = self._resolve_cache_spec(cache_interval,
                                                cache_schedule, steps,
                                                fusion_start)
        if eff_interval and self.concept_crop:
            raise ValueError(
                "cache_interval is exclusive with concept_crop (the "
                "strip program has no shallow variant); mesh composes")
        key = jax.random.PRNGKey(seed)

        # --- conditioning ---------------------------------------------
        ep, pp, en, pn = self.encode(prompt, negative_prompt)
        tids = sdxl.add_time_ids((height, width), (0, 0), (height, width))
        base_inputs = multiconcept.make_base_inputs(
            ep, pp, en, pn, tids, guidance_scale)

        region_specs = rewrite.parse_rewrite(prompt_rewrite)
        concept_inputs = []
        loras_final: list = []
        ip_adapters: list = []
        concept_cns: list = []
        concept_ip_ctxs: list = []
        for k, region in enumerate(region_specs):
            # Region prompts encode with the concept's text-encoder LoRA
            # active (reference: set_adapters before region encode_prompt,
            # lora_pipeline.py:336-347).
            tree_k = concept_loras[k] if k < len(concept_loras) else None
            te_lora = (None, None)
            if tree_k is not None and isinstance(tree_k, dict):
                def te_merged(key):
                    char = tree_k.get(key)
                    style = (style_lora.get(key)
                             if isinstance(style_lora, dict) else None)
                    if style is not None and char is not None:
                        return lora_lib.merge_loras(
                            [char, style], list(self.char_style_weights))
                    return char if char is not None else style
                te_lora = (te_merged("text_encoder") or None,
                           te_merged("text_encoder_2") or None)
            rep, rpp, ren, rpn = self.encode(region.prompt,
                                             region.negative_prompt,
                                             te_lora=te_lora)
            ip_ctx = None
            if instantid is not None and k < len(face_embeddings) \
                    and face_embeddings[k] is not None:
                from omg_tpu import instantid as iid
                ip_ctx = iid.encode_face_tokens(
                    instantid.resampler_params, instantid.resampler_cfg,
                    jnp.asarray(face_embeddings[k]))
            concept_inputs.append(multiconcept.make_concept_inputs(
                rep, rpp, ren, rpn, tids, ip_context=ip_ctx))

            tree = concept_loras[k] if k < len(concept_loras) else None
            unet_tree = None
            if tree is not None:
                unet_tree = tree.get("unet", tree)
            style_tree = None
            if style_lora is not None:
                style_tree = style_lora.get("unet", style_lora)
            if style_tree is not None:
                merged = lora_lib.merge_loras(
                    [unet_tree, style_tree], list(self.char_style_weights))
            else:
                merged = unet_tree
            loras_final.append(
                lora_lib.scale_lora(merged, self.concept_lora_scale))

            if instantid is not None:
                ip_adapters.append(instantid.ip_adapter_layers)
                # IdentityNet conditions are built AFTER stage 1: the
                # reference renders the kps of faces detected on the
                # stage-1 image (inference_instantid.py:352-354), so the
                # condition image may not exist yet — stash the
                # per-concept image-prompt tokens for then
                concept_ip_ctxs.append(ip_ctx)

        base_cns = []
        if spatial_condition is not None and controlnet_params is not None:
            # guidance window + guess mode mirror the reference pipeline
            # arguments (control_guidance_start/end + guess_mode,
            # lora_pipeline.py:421-427,497-505)
            base_cns.append(multiconcept.ControlNetInputs(
                params=controlnet_params,
                cond_image=jnp.asarray(spatial_condition, jnp.float32)[None]
                / 255.0,
                scale=jnp.asarray(controlnet_scale),
                guidance_start=jnp.asarray(control_guidance_start,
                                           jnp.float32),
                guidance_end=jnp.asarray(control_guidance_end, jnp.float32),
                guess_mode=bool(controlnet_guess_mode)))

        controller = p2p.P2PControl.build(
            [prompt, prompt], steps, cross_replace_steps=1.0,
            self_replace_steps=0.4, width=width // 32, height=height // 32,
            tokenizer=self.tokenizer)

        # --- stage 1 (dedup fast path; see multiconcept.py) ------------
        stage1_params = stage2_params = self.params.unet
        lane_sharding = spatial_sharding = None
        if self.mesh is not None:
            # latency layout: stage 1 spatially sharded (CFG lanes x
            # latent-H shards) on replicated weights; stage 2 runs the
            # lane-parallel 4+2K program on the same replicated copy
            stage1_params, lane_sharding, spatial_sharding = \
                self._mesh_placements()
            stage2_params = stage1_params
            # H-sharding is only exact when the DEEPEST UNet level's H
            # still divides the seq axis: a padded shard (e.g. a tiny
            # 4-row latent halved to 2 rows over a 4-way axis) makes
            # the stride-2-conv -> nearest-upsample reshape chain leak
            # padding garbage under GSPMD (reproduced: ~0.2 latent
            # error at the tiny geometry, exact at divisible ones). At
            # SDXL 1024^2 the deepest level is 32 rows over a 4-way
            # axis — divisible; non-divisible canvases (the 832/1216/
            # 1344-high aspect buckets) drop to LANE-ONLY sharding:
            # the two CFG rows over the data axis, H unsharded — still
            # a 2-way stage-1 split with no padded dimension.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from omg_tpu.parallel import mesh as mesh_lib
            seq = self.mesh.shape[mesh_lib.MODEL_AXIS]
            depth = len(self.cfg.unet.block_out_channels) - 1
            if ((height // 8) >> depth) % max(seq, 1) != 0:
                spatial_sharding = NamedSharding(
                    self.mesh, P(mesh_lib.DATA_AXIS, None))
        lat1, cache = multiconcept.sample_stage1_cached(
            self.cfg, sched, stage1_params, key=key, height=height,
            width=width, base_inputs=base_inputs,
            fusion_start=fusion_start,
            base_controlnets=base_cns, cn_cfg=self.cn_cfg,
            spatial_sharding=spatial_sharding,
            # the lane-parallel stage 2 never reads the trajectory —
            # don't pay the per-step store in the latency-critical loop
            record_trajectory=(self.mesh is None),
            initial_noise=initial_noise,
            cache_interval=eff_interval)
        img1 = self._decode(lat1)

        # --- masks -----------------------------------------------------
        if masks is None:
            masks = self._predict_masks(img1[1], prompt,
                                        len(region_specs),
                                        detection_classes)
        masks = list(masks)

        if self.mesh is not None:
            # boundary reshard: the cache latents carry stage 1's
            # SPATIAL sharding; fed raw into the lane-parallel stage-2
            # loop, GSPMD "involuntarily rematerializes" the lane concat
            # every step (observed in the dryrun SPMD log). One explicit
            # replication here keeps the stage-2 loop clean.
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(lane_sharding.mesh, P())
            cache = multiconcept.StageCache(
                latents=jax.device_put(cache.latents, rep),
                sched_state=jax.tree.map(
                    lambda x: jax.device_put(x, rep), cache.sched_state),
                a_traj=None, a_final=jax.device_put(cache.a_final, rep))

        # IdentityNet conditions: kps of the faces DETECTED ON STAGE 1,
        # at canvas coordinates (reference: face_app.get(stage1) +
        # draw_kps_multi, inference_instantid.py:352-354); an explicit
        # face_kps_image (canvas-frame) overrides.
        if (instantid is not None
                and instantid.identitynet_params is not None):
            if face_kps_image is None and face_kps_provider is not None:
                face_kps_image = face_kps_provider(img1[1])
            if face_kps_image is not None:
                kimg = jnp.asarray(face_kps_image, jnp.float32)[None] / 255.0
                for ip_ctx in concept_ip_ctxs:
                    concept_cns.append(multiconcept.ControlNetInputs(
                        params=instantid.identitynet_params,
                        cond_image=kimg,
                        scale=jnp.asarray(instantid.identitynet_scale),
                        encoder_hidden_states=ip_ctx))

        # --- stage 2 ---------------------------------------------------
        img2 = None
        if any(m is not None for m in masks):
            mask_stack = regions_lib.make_concept_mask_stack(
                masks, (height // 8, width // 8), len(region_specs))
            lat2 = multiconcept.sample_stage2_resumed(
                self.cfg, sched, stage2_params, cache,
                base_inputs=base_inputs, controller=controller,
                concept_inputs=concept_inputs, concept_loras=loras_final,
                masks=mask_stack, fusion_start=fusion_start,
                concept_ip_adapters=ip_adapters,
                ip_scale=(instantid.ip_scale
                          if instantid is not None else 1.0),
                base_controlnets=base_cns, concept_controlnets=concept_cns,
                cn_cfg=self.cn_cfg,
                lane_sharding=(lane_sharding
                               if len(region_specs) > 0 else None),
                # base-row spatial ControlNets compose with crop (the
                # base rows run full-frame — residuals are exact);
                # per-concept IdentityNet rows still force the exact
                # program (the strip lanes don't take CN residuals)
                concept_crop=(self.concept_crop
                              and self.mesh is None
                              and len(region_specs) > 0
                              and not any(c is not None
                                          for c in concept_cns)
                              and multiconcept.crop_strips_ok(
                                  self.cfg, width // 8,
                                  len(region_specs))),
                cache_interval=(eff_interval
                                if len(region_specs) > 0 else 0))
            img2 = self._decode(lat2)

        return GenerationResult(stage1=img1, stage2=img2, masks=masks)

    def _decode(self, latents: Array) -> np.ndarray:
        sharding = None
        if self.mesh is not None:
            # mesh latency mode: spatially-sharded decode (H axis over
            # all chips; convs + the one bottleneck attention are
            # token-parallel with replicated weights)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from omg_tpu.parallel import mesh as mesh_lib
            _, lane_sharding, _ = self._mesh_placements()
            n = len(self.mesh.devices.reshape(-1))
            if latents.shape[1] % n == 0:   # H must split over the chips
                sharding = NamedSharding(lane_sharding.mesh,
                                         P(None, mesh_lib.DATA_AXIS))
        img = sdxl.decode_latents(self.cfg, self.params.vae, latents,
                                  spatial_sharding=sharding)
        return np.asarray(
            (img * 255).astype(jnp.uint8))

    # --------------------------------------------------- batched serving

    def _region_conditioning(self, prompt_rewrite: str,
                             concept_loras: Sequence[Optional[dict]],
                             style_lora: Optional[dict], tids,
                             instantid=None,
                             face_embeddings: Sequence = ()):
        """Per-request region prompts -> (specs, concept_inputs, loras).
        generate_batch's per-request conditioning build: region prompts
        with concept/style text-encoder LoRAs, plus InstantID ip_context
        tokens when the request carries face embeddings (BASELINE
        config #5's batched half)."""
        region_specs = rewrite.parse_rewrite(prompt_rewrite)
        concept_inputs, loras_final = [], []
        for k, region in enumerate(region_specs):
            tree_k = concept_loras[k] if k < len(concept_loras) else None
            te_lora = (None, None)
            if tree_k is not None and isinstance(tree_k, dict):
                def te_merged(key):
                    char = tree_k.get(key)
                    style = (style_lora.get(key)
                             if isinstance(style_lora, dict) else None)
                    if style is not None and char is not None:
                        return lora_lib.merge_loras(
                            [char, style], list(self.char_style_weights))
                    return char if char is not None else style
                te_lora = (te_merged("text_encoder") or None,
                           te_merged("text_encoder_2") or None)
            rep_, rpp, ren, rpn = self.encode(region.prompt,
                                              region.negative_prompt,
                                              te_lora=te_lora)
            ip_ctx = None
            if instantid is not None and k < len(face_embeddings) \
                    and face_embeddings[k] is not None:
                from omg_tpu import instantid as iid
                ip_ctx = iid.encode_face_tokens(
                    instantid.resampler_params, instantid.resampler_cfg,
                    jnp.asarray(face_embeddings[k]))
            concept_inputs.append(multiconcept.make_concept_inputs(
                rep_, rpp, ren, rpn, tids, ip_context=ip_ctx))
            unet_tree = tree_k.get("unet", tree_k) if tree_k else None
            style_tree = (style_lora.get("unet", style_lora)
                          if style_lora is not None else None)
            merged = (lora_lib.merge_loras(
                [unet_tree, style_tree], list(self.char_style_weights))
                if style_tree is not None else unet_tree)
            loras_final.append(
                lora_lib.scale_lora(merged, self.concept_lora_scale))
        return region_specs, concept_inputs, loras_final

    def generate_batch(self, requests: Sequence[dict]
                       ) -> List[GenerationResult]:
        """R compatible requests as ONE vmapped program per stage.

        Request dicts take generate()'s keyword arguments. All requests
        must share height/width/steps/scheduler (one compiled program;
        the server buckets by these). Detection still runs per-request
        on the host between the stages. Plays the batched half of
        BASELINE config #5 that the reference's gradio app never had
        (it serves strictly serially, app.py:359-473) — including
        InstantID and ControlNet requests: face requests batch when
        they share one InstantIDModels stack (no-face requests ride
        along with zero IP tokens and zero-scale IdentityNet rows —
        exact no-ops), and spatial-condition requests batch when they
        share one ControlNet weight tree (per-request cond images,
        scales, and guidance windows; no-condition requests get
        scale 0). Guess-mode and explicit-mask requests run serially.
        """
        def serial(rs):
            out = []
            for r in rs:
                r = dict(r)
                out.append(self.generate(r.pop("prompt"), **r))
            return out

        unsupported = ("masks", "controlnet_guess_mode", "initial_noise")
        # a mesh engine is the LATENCY layout: all chips serve one
        # request at a time, so requests run serially through generate()
        if len(requests) == 1 or self.mesh is not None or any(
                r.get(k) for r in requests for k in unsupported):
            return serial(requests)
        # heterogeneous weights cannot share one vmapped program: all
        # live InstantID stacks / ControlNet trees must be one object
        live_iids = [r["instantid"] for r in requests if r.get("instantid")]
        if any(i is not live_iids[0] for i in live_iids):
            return serial(requests)
        live_cnp = [r["controlnet_params"] for r in requests
                    if r.get("controlnet_params") is not None]
        if any(c is not live_cnp[0] for c in live_cnp):
            return serial(requests)
        iid_models = live_iids[0] if live_iids else None
        steps = requests[0].get("num_steps") or self.num_steps
        height = requests[0].get("height", 1024)
        width = requests[0].get("width", 1024)
        sched_name = requests[0].get("scheduler") or self.scheduler

        fusion_start = round(steps * regions_lib.FUSION_START_STEP / 50)

        def _req_interval(r):
            # -> 0 / int interval / per-step schedule tuple (all
            # hashable: the compiled-program compatibility key below
            # compares them directly)
            return self._resolve_cache_spec(
                r.get("cache_interval"), r.get("cache_schedule"),
                steps, fusion_start)

        # NOTE: named eff_interval (not ci) — the zero_ip scan below
        # rebinds a loop variable over ConceptInputs rows
        eff_interval = _req_interval(requests[0])
        if eff_interval and self.concept_crop:
            raise ValueError(
                "cache_interval is exclusive with mesh and concept_crop "
                "(the shallow program is single-chip, full-frame)")
        for r in requests[1:]:
            if ((r.get("num_steps") or self.num_steps, r.get("height", 1024),
                 r.get("width", 1024), r.get("scheduler") or self.scheduler,
                 _req_interval(r))
                    != (steps, height, width, sched_name, eff_interval)):
                raise ValueError("batched requests must share "
                                 "height/width/steps/scheduler/"
                                 "cache_interval (bucket them)")
        sched = schedulers.make_schedule(sched_name, steps)
        tids = sdxl.add_time_ids((height, width), (0, 0), (height, width))

        base_list, concepts_list, loras_list, specs_list = [], [], [], []
        for r in requests:
            ep, pp, en, pn = self.encode(r["prompt"],
                                         r.get("negative_prompt", ""))
            base_list.append(multiconcept.make_base_inputs(
                ep, pp, en, pn, tids, r.get("guidance_scale", 7.5)))
            specs, concepts, loras = self._region_conditioning(
                r.get("prompt_rewrite", ""), r.get("concept_loras", ()),
                r.get("style_lora"), tids,
                instantid=(iid_models if r.get("instantid") else None),
                face_embeddings=r.get("face_embeddings", ()))
            specs_list.append(specs)
            concepts_list.append(concepts)
            loras_list.append(loras)

        # pad every request to the same concept count with no-op slots
        # (zero mask => fusion no-op, regions.make_concept_mask_stack)
        max_k = max((len(c) for c in concepts_list), default=0)
        neutral = None
        for r_i in range(len(requests)):
            while len(concepts_list[r_i]) < max_k:
                if neutral is None:
                    ep, pp, en, pn = self.encode("", "")
                    neutral = multiconcept.make_concept_inputs(
                        ep, pp, en, pn, tids)
                concepts_list[r_i] = list(concepts_list[r_i]) + [neutral]
                loras_list[r_i] = list(loras_list[r_i]) + [None]

        # InstantID rows must share ONE tree structure across requests:
        # no-face (concept, request) slots get zero ip_context tokens —
        # an exact no-op (to_v_ip is bias-free)
        zero_ip = None
        for cl in concepts_list:
            for ci in cl:
                if ci.ip_context is not None:
                    zero_ip = jnp.zeros_like(ci.ip_context)
                    break
            if zero_ip is not None:
                break
        if zero_ip is not None:
            concepts_list = [
                [ci if ci.ip_context is not None
                 else ci._replace(ip_context=zero_ip) for ci in cl]
                for cl in concepts_list]

        def stack(*xs):
            return jax.tree.map(lambda *ls: jnp.stack(ls), *xs)

        base_r = stack(*base_list)
        keys = jnp.stack([jax.random.PRNGKey(int(r.get("seed", 14)))
                          for r in requests])

        # shared spatial ControlNet: per-request cond/scale/window rows;
        # requests without a condition ride with scale 0 (exact no-op)
        base_cn_params = base_cn_conds_r = None
        if live_cnp:
            conds, scales, gss, ges = [], [], [], []
            for r in requests:
                sc = r.get("spatial_condition")
                has = sc is not None and \
                    r.get("controlnet_params") is not None
                conds.append(
                    jnp.asarray(sc, jnp.float32)[None] / 255.0 if has
                    else jnp.zeros((1, height, width, 3), jnp.float32))
                scales.append(float(r.get("controlnet_scale", 1.0))
                              if has else 0.0)
                gss.append(float(r.get("control_guidance_start", 0.0)))
                ges.append(float(r.get("control_guidance_end", 1.0)))
            base_cn_params = live_cnp[0]
            base_cn_conds_r = (
                jnp.stack(conds), jnp.asarray(scales, jnp.float32),
                jnp.asarray(gss, jnp.float32),
                jnp.asarray(ges, jnp.float32))

        lat1_r, cache_r = multiconcept.sample_stage1_batch(
            self.cfg, sched, self.params.unet, keys, base_r,
            height=height, width=width, fusion_start=fusion_start,
            base_cn_params=base_cn_params,
            base_cn_conds_r=base_cn_conds_r, cn_cfg=self.cn_cfg,
            cache_interval=eff_interval)

        results = []
        masks_per_req = []
        any_stage2 = False
        for r_i, r in enumerate(requests):
            img1 = self._decode(lat1_r[r_i])
            masks = self._predict_masks(
                img1[1], r["prompt"], len(specs_list[r_i]),
                r.get("detection_classes", ("man", "woman")))
            any_stage2 = any_stage2 or any(m is not None for m in masks)
            masks_per_req.append(masks)
            results.append(GenerationResult(stage1=img1, stage2=None,
                                            masks=masks))

        if max_k == 0 or not any_stage2:
            return results

        mask_stacks = jnp.stack([
            regions_lib.make_concept_mask_stack(
                masks_per_req[r_i], (height // 8, width // 8), max_k)
            for r_i in range(len(requests))])
        controller = p2p.P2PControl.build(
            [requests[0]["prompt"]] * 2, steps, cross_replace_steps=1.0,
            self_replace_steps=0.4, width=width // 32, height=height // 32,
            tokenizer=self.tokenizer)
        concepts_r = tuple(
            stack(*[concepts_list[r_i][k] for r_i in range(len(requests))])
            for k in range(max_k))
        loras_r = tuple(
            lora_lib.align_loras(
                [loras_list[r_i][k] for r_i in range(len(requests))])
            for k in range(max_k))
        loras_r = tuple(
            (stack(*t) if any(x is not None for x in t) else None)
            for t in loras_r)

        # InstantID stage-2 conditioning: shared decoupled-K/V weights;
        # per-request IdentityNet rows from the kps of the faces found
        # on each request's OWN stage-1 image (reference semantics,
        # inference_instantid.py:352-354); no-face rows get scale 0
        ip_adapters = ()
        ip_scale = 1.0
        concept_cn_params = concept_cn_conds_r = None
        if iid_models is not None:
            ip_adapters = (iid_models.ip_adapter_layers,)
            ip_scale = iid_models.ip_scale
            if iid_models.identitynet_params is not None:
                kimgs, has_kps = [], []
                for r_i, r in enumerate(requests):
                    kimg = None
                    if r.get("instantid"):
                        kimg = r.get("face_kps_image")
                        if kimg is None and r.get("face_kps_provider"):
                            kimg = r["face_kps_provider"](
                                results[r_i].stage1[1])
                    has_kps.append(kimg is not None)
                    kimgs.append(
                        jnp.asarray(kimg, jnp.float32)[None] / 255.0
                        if kimg is not None
                        else jnp.zeros((1, height, width, 3), jnp.float32))
                cond_r = jnp.stack(kimgs)
                concept_cn_params = iid_models.identitynet_params
                conds_k = []
                for k in range(max_k):
                    ehs_rows, scales = [], []
                    for r_i, r in enumerate(requests):
                        fe = r.get("face_embeddings", ())
                        live = (r.get("instantid") and has_kps[r_i]
                                and k < len(fe) and fe[k] is not None)
                        ehs_rows.append(concepts_list[r_i][k].ip_context
                                        if zero_ip is not None else None)
                        scales.append(iid_models.identitynet_scale
                                      if live else 0.0)
                    ehs_r = (jnp.stack(ehs_rows)
                             if zero_ip is not None else None)
                    conds_k.append((cond_r,
                                    jnp.asarray(scales, jnp.float32),
                                    ehs_r))
                concept_cn_conds_r = tuple(conds_k)

        lat2_r = multiconcept.sample_stage2_batch(
            self.cfg, sched, self.params.unet, cache_r, base_r, controller,
            concepts_r, loras_r, mask_stacks, fusion_start=fusion_start,
            ip_scale_static=ip_scale,
            concept_ip_adapters=ip_adapters,
            concept_cn_params=concept_cn_params,
            concept_cn_conds_r=concept_cn_conds_r,
            base_cn_params=base_cn_params,
            base_cn_conds_r=base_cn_conds_r, cn_cfg=self.cn_cfg,
            cache_interval=eff_interval)
        for r_i in range(len(requests)):
            if any(m is not None for m in masks_per_req[r_i]):
                results[r_i] = dataclasses.replace(
                    results[r_i], stage2=self._decode(lat2_r[r_i]))
        return results

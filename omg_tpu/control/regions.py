"""Stage-2 region noise fusion as pure functions.

This is OMG's algorithmic heart: after step 15 of the stage-2 denoise,
each concept's masked latent region has its noise prediction replaced by
the output of that concept's personalized UNet (reference:
src/pipelines/lora_pipeline.py:568-607; identical structure at
src/pipelines/instantid_pipeline.py:618-683).

Design differences from the torch reference (all performance, not
semantics):
  * Masks are brought to latent resolution once per request, not
    re-interpolated inside the step loop (reference re-runs
    F.interpolate at :578-580 and :674-681 every step).
  * The fusion is a single fused elementwise expression over the whole
    [K, 2, H, W, C] stack of region predictions — no boolean gather/
    scatter (`tensor[mask == 1]`) which would force dynamic shapes.
  * The `i > 15 and stage == 2` gate (reference :568) is a traced
    predicate so one compiled step program covers all steps.

Batch-layout contract (reference): base noise_pred rows are
[uncond_A, uncond_B, cond_A, cond_B]; fusion rewrites rows 1 and 3
(copy B) before CFG (reference :570,606-607). Each region prediction is
a [2, H, W, C] (uncond, cond) pair produced from latent row 3 duplicated
(reference :583-585).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from omg_tpu.nn import layers

Array = jax.Array

# Default fusion start: fuse when step index i > FUSION_START_STEP
# (reference: src/pipelines/lora_pipeline.py:568).
FUSION_START_STEP = 15
# Full replacement inside mask regions (reference :573).
REPLACE_RATIO = 1.0


def masks_to_latent(masks: Array, latent_hw: tuple) -> Array:
    """[K, H, W] pixel-space binary masks -> [K, h, w] latent-space.

    Nearest-neighbour, matching torch F.interpolate(mode='nearest')
    (reference :578-580). Done once per request, outside the step loop.
    """
    return jax.vmap(lambda m: layers.nearest_resize(m, latent_hw))(masks)


def union_mask(masks: Array) -> Array:
    """[K, h, w] -> [h, w] union-of-masks (reference get_region_mask :674-681)."""
    return (jnp.sum(masks == 1, axis=0) > 0).astype(masks.dtype)


def fuse_region_edit(edit: Array, region_preds: Array, masks: Array,
                     *, active: Array,
                     replace_ratio: float = REPLACE_RATIO) -> Array:
    """Fuse per-concept masked predictions into copy-B's (uncond, cond) rows.

    Args:
      edit:         [2, h, w, C]  copy-B base eps rows (uncond_B, cond_B)
      region_preds: [K, 2, h, w, C] per-concept (uncond, cond) eps
      masks:        [K, h, w]  latent-resolution binary masks (0 rows for
                    inactive concept slots — a zero mask is a no-op, which
                    is exactly the reference's `mask is None` skip :577)
      active:       scalar bool — the traced `i > 15 and stage == 2` gate
      replace_ratio: blend amount inside mask regions (reference :573-574)

    Overlapping concept masks SUM their mask-normalized predictions —
    deliberately: the reference's per-concept loop does `+=` into
    new_noise_pred for each concept (lora_pipeline.py:602), so shared
    pixels accumulate there too. This is reference-exact, not a merge
    policy choice.

    Semantics (reference :569-607): outside the union of masks, copy-B
    noise is the base model's; inside each concept mask, it becomes
    replace_ratio * concept_eps / mask_value (+ (1-ratio) * base). Binary
    masks make the division a no-op; it is kept for parity with the
    reference's mask normalization (:602).
    """
    union = union_mask(masks)[None, :, :, None]          # [1, h, w, 1]
    new = jnp.where(union == 0, edit, (1.0 - replace_ratio) * edit)

    m = masks[:, None, :, :, None]                       # [K, 1, h, w, 1]
    safe = jnp.where(m == 1, m, 1.0).astype(region_preds.dtype)
    contrib = jnp.where(m == 1, region_preds / safe, 0.0)
    new = new + replace_ratio * jnp.sum(contrib, axis=0).astype(new.dtype)
    return jnp.where(active, new, edit)


def fuse_region_noise(noise_pred: Array, region_preds: Array, masks: Array,
                      *, active: Array,
                      replace_ratio: float = REPLACE_RATIO) -> Array:
    """4-row layout wrapper: rewrite rows 1 and 3 (copy B) of
    [unc_A, unc_B, cond_A, cond_B] (reference :570,606-607)."""
    edit = jnp.stack([noise_pred[1], noise_pred[3]])     # [2, h, w, C]
    new = fuse_region_edit(edit, region_preds, masks, active=active,
                           replace_ratio=replace_ratio)
    return noise_pred.at[1].set(new[0]).at[3].set(new[1])


def make_concept_mask_stack(masks: Sequence[Optional[Array]],
                            latent_hw: tuple, max_concepts: int) -> Array:
    """Pack optional per-concept masks into a dense [max_K, h, w] stack.

    None masks become zero rows (no-ops in fuse_region_noise), so the
    number of *active* concepts is data, not shape — one compiled program
    serves 0..max_K concepts (recompilation management, SURVEY.md §7).
    """
    rows = []
    for i in range(max_concepts):
        m = masks[i] if i < len(masks) else None
        if m is None:
            rows.append(jnp.zeros(latent_hw, jnp.float32))
        else:
            m = jnp.asarray(m, jnp.float32)
            if m.shape != tuple(latent_hw):
                m = layers.nearest_resize(m, latent_hw)
            rows.append(m)
    return jnp.stack(rows)

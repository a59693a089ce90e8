"""Prompt-to-prompt attention control, TPU-native.

The torch reference implements P2P as a stateful controller object with
layer/step counters, mutated by attention-processor hooks installed on
every UNet Attention layer (reference: src/prompt_attention/
p2p_attention.py:11-147, installed by src/pipelines/lora_pipeline.py:
136-152). Counters infer the current step from how many layers have been
called — impossible (and unnecessary) under jit.

Here the controller is data + a pure function:
  * precomputed host-side tensors — the word-replacement ``mapper``
    (reference: seq_aligner.get_replacement_mapper) and the per-step
    per-word ``cross_alpha`` blend schedule (reference:
    p2p_utils.get_time_words_attention_alpha);
  * a per-step view (``P2PControl.at_step(i)``) that the UNet applies to
    materialized attention probabilities. The step index is a traced
    value, so one compiled UNet serves all 50 steps.

Batch-layout contract (identical to the reference): the base UNet runs a
batch of 4 = [uncond_A, uncond_B, cond_A, cond_B]; edits touch only the
conditional half (reference applies ``forward`` to ``attn[h//2:]``,
p2p_attention.py:34) and only copy B (``attn[1:]``, :129-137):
  * cross-attn: probs_B <- mapper-projected probs_A * alpha + (1-alpha) * probs_B
    (p2p_attention.py:131-134,146-147)
  * self-attn: probs_B <- probs_A while self_start <= step < self_end and
    only for layers whose query length <= width*height
    (p2p_attention.py:114-118,126).

Attribution: the host-side token-alignment helpers below (get_word_inds,
time_words_alpha, replacement_mapper) follow Google's Apache-2.0
prompt-to-prompt utilities (github.com/google/prompt-to-prompt,
ptp_utils.py / seq_aligner.py), which the torch reference vendors as
p2p_utils.py / seq_aligner.py. The alignment walk is semantics-pinned —
any deviation breaks bit-parity with the controller schedule — so these
~100 host-side numpy lines intentionally mirror that upstream math.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MAX_WORDS = 77


# --------------------------------------------------------------------------
# Host-side schedule / mapper construction (numpy; runs once per request)
# --------------------------------------------------------------------------

def get_word_inds(text: str, word_place, tokenizer) -> np.ndarray:
    """Token indices (1-based, inside BOS..EOS) covering a given word.

    Mirrors the reference's alignment walk (p2p_utils.py:35-53): token
    pieces are accumulated until they consume each whitespace word.
    """
    split_text = text.split(" ")
    if isinstance(word_place, str):
        word_place = [i for i, w in enumerate(split_text) if w == word_place]
    elif isinstance(word_place, int):
        word_place = [word_place]
    out = []
    if len(word_place) > 0:
        words_encode = [tokenizer.decode([tok]).strip("#")
                        for tok in tokenizer.encode(text)][1:-1]
        cur_len, ptr = 0, 0
        for i, piece in enumerate(words_encode):
            cur_len += len(piece)
            if ptr in word_place:
                out.append(i + 1)
            if cur_len >= len(split_text[ptr]):
                ptr += 1
                cur_len = 0
    return np.array(out)


def time_words_alpha(prompts: Sequence[str], num_steps: int,
                     cross_replace_steps, tokenizer=None,
                     max_words: int = MAX_WORDS) -> np.ndarray:
    """Per-step, per-word cross-replace blend in [0,1] -> [S+1, P-1, W].

    ``cross_replace_steps`` is a float, (start, end) tuple, or a dict of
    word -> bounds with a "default_" key (reference: p2p_utils.py:55-73).
    """
    if not isinstance(cross_replace_steps, dict):
        cross_replace_steps = {"default_": cross_replace_steps}
    if "default_" not in cross_replace_steps:
        cross_replace_steps["default_"] = (0.0, 1.0)

    alpha = np.zeros((num_steps + 1, len(prompts) - 1, max_words), np.float32)

    def update(bounds, prompt_ind, word_inds=None):
        if isinstance(bounds, float) or isinstance(bounds, int):
            bounds = (0.0, float(bounds))
        start = int(bounds[0] * (num_steps + 1))
        end = int(bounds[1] * (num_steps + 1))
        if word_inds is None:
            word_inds = np.arange(max_words)
        alpha[:start, prompt_ind, word_inds] = 0
        alpha[start:end, prompt_ind, word_inds] = 1
        alpha[end:, prompt_ind, word_inds] = 0

    for i in range(len(prompts) - 1):
        update(cross_replace_steps["default_"], i)
    for key, bounds in cross_replace_steps.items():
        if key == "default_":
            continue
        for i in range(1, len(prompts)):
            inds = get_word_inds(prompts[i], key, tokenizer)
            if len(inds) > 0:
                update(bounds, i - 1, inds)
    return alpha


def replacement_mapper(prompts: Sequence[str], tokenizer=None,
                       max_words: int = MAX_WORDS) -> np.ndarray:
    """Word-level token mapper between prompt 0 and prompt 1 -> [W, W].

    Identity when the prompts are equal — the only case OMG exercises
    (reference calls AttentionReplace with [prompt, prompt],
    inference_lora.py:156; seq_aligner.py:25-58 builds the general
    cross-prompt mapper with 1/ratio weights for split words).
    """
    x, y = prompts[0], prompts[1]
    if x == y or tokenizer is None:
        return np.eye(max_words, dtype=np.float32)

    words_x, words_y = x.split(" "), y.split(" ")
    if len(words_x) != len(words_y):
        raise ValueError(
            "attention replacement edit needs prompts with the same word "
            f"count, got {len(words_x)} vs {len(words_y)}")
    inds_replace = [i for i in range(len(words_y)) if words_y[i] != words_x[i]]
    inds_source = [get_word_inds(x, i, tokenizer) for i in inds_replace]
    inds_target = [get_word_inds(y, i, tokenizer) for i in inds_replace]
    mapper = np.zeros((max_words, max_words), dtype=np.float32)
    i = j = 0
    cur_inds = 0
    while i < max_words and j < max_words:
        if cur_inds < len(inds_source) and inds_source[cur_inds][0] == i:
            inds_s, inds_t = inds_source[cur_inds], inds_target[cur_inds]
            if len(inds_s) == len(inds_t):
                mapper[inds_s, inds_t] = 1
            else:
                ratio = 1 / len(inds_t)
                for t in inds_t:
                    mapper[inds_s, t] = ratio
            i += len(inds_s)
            j += len(inds_t)
            cur_inds += 1
        elif cur_inds < len(inds_source):
            mapper[i, j] = 1
            i += 1
            j += 1
        else:
            mapper[i, j] = 1
            i += 1
            j += 1
    return mapper


# --------------------------------------------------------------------------
# Device-side controller
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class P2PControl:
    """Immutable P2P schedule. ``at_step(i)`` yields the per-step transform."""

    mapper: Array            # [W, W] fp32
    cross_alpha: Array       # [S+1, W] fp32 (single-edit: P-1 == 1 folded)
    self_start: int          # static step bounds for self-attn replace
    self_end: int
    self_seq_limit: int      # static: replace self-attn only if Nq <= limit

    @classmethod
    def build(cls, prompts: Sequence[str], num_steps: int, *,
              cross_replace_steps=1.0, self_replace_steps=0.4,
              width: int = 32, height: int = 32,
              tokenizer=None) -> "P2PControl":
        """Mirror of AttentionReplace.__init__ defaults
        (reference: inference_lora.py:156 — num_steps=50,
        cross_replace_steps={'default_': 1.}, self_replace_steps=0.4,
        width=height=1024//32)."""
        alpha = time_words_alpha(prompts, num_steps, cross_replace_steps,
                                 tokenizer)
        mapper = replacement_mapper(prompts, tokenizer)
        if isinstance(self_replace_steps, (int, float)):
            self_replace_steps = (0.0, float(self_replace_steps))
        return cls(
            mapper=jnp.asarray(mapper),
            cross_alpha=jnp.asarray(alpha[:, 0]),
            self_start=int(num_steps * self_replace_steps[0]),
            self_end=int(num_steps * self_replace_steps[1]),
            self_seq_limit=width * height,
        )

    def at_step(self, step: Array, *, src_lane: int = 2,
                dst_lane: int = 3) -> "P2PStepControl":
        """``src_lane``/``dst_lane``: batch rows holding cond-A (the edit
        source) and cond-B (the edit target). Default 2/3 matches the
        reference's [uncond_A, uncond_B, cond_A, cond_B] layout; the
        trajectory-fed 3-row fast path uses 0/2."""
        return P2PStepControl(self, step, src_lane=src_lane,
                              dst_lane=dst_lane)


def _p2p_flatten(c: "P2PControl"):
    return (c.mapper, c.cross_alpha), (c.self_start, c.self_end,
                                       c.self_seq_limit)


def _p2p_unflatten(aux, children):
    return P2PControl(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(P2PControl, _p2p_flatten, _p2p_unflatten)


class P2PStepControl:
    """AttnControl protocol implementation bound to one (traced) step."""

    def __init__(self, ctl: P2PControl, step: Array, *, src_lane: int = 2,
                 dst_lane: int = 3):
        self.ctl = ctl
        self.step = step
        self.src_lane = src_lane
        self.dst_lane = dst_lane

    def wants(self, *, is_cross: bool, num_queries: int) -> bool:
        """Static gate: do we need materialized probs on this layer?

        Cross-attn is always edited (alpha may be 0 at some steps — traced).
        Self-attn is edited only on layers with Nq <= width*height and only
        if the schedule has a non-empty replace window (static), matching
        replace_self_attention's resolution gate (p2p_attention.py:114-118).
        """
        if is_cross:
            return True
        return num_queries <= self.ctl.self_seq_limit and self.ctl.self_end > 0

    def __call__(self, probs: Array, *, is_cross: bool) -> Array:
        """probs: [4, H, Nq, Nk] = [uncond_A, uncond_B, cond_A, cond_B].

        Reference-faithful probability edit. This materialized-probs path
        exists for parity testing; the hot path uses the O(N²)-free lane
        formulation below (``self_lane_qk`` / ``cross_lane_out``).
        """
        ctl = self.ctl
        base = probs[self.src_lane]
        repl = probs[self.dst_lane]
        if is_cross:
            nk = probs.shape[-1]
            alpha = jax.lax.dynamic_index_in_dim(
                ctl.cross_alpha, self.step, keepdims=False)[:nk]
            alpha = alpha.astype(probs.dtype)
            projected = jnp.einsum("hpw,wn->hpn", base,
                                   ctl.mapper[:nk, :nk].astype(probs.dtype))
            new_repl = projected * alpha + (1.0 - alpha) * repl
        else:
            in_window = jnp.logical_and(ctl.self_start <= self.step,
                                        self.step < ctl.self_end)
            new_repl = jnp.where(in_window, base, repl)
        return probs.at[self.dst_lane].set(new_repl)

    # -- O(N²)-free lane formulation ------------------------------------
    #
    # Attention output is linear in the probabilities, so the reference's
    # prob edits (p2p_attention.py:124-138) can be pushed to the attention
    # *inputs/outputs* and never materialize an [Nq, Nk] matrix:
    #
    #   self-attn replace:  probs_A @ V_B  ==  sdpa(q_A, k_A, v_B)
    #     -> substitute lanes q[3]<-q[2], k[3]<-k[2] inside the window.
    #   cross-attn blend:   (α ⊙ (probs_A @ M) + (1-α) ⊙ probs_B) @ V
    #     ==  sdpa(q_A, k_A, M @ (α ⊙ V))  +  sdpa(q_B, k_B, (1-α) ⊙ V)
    #     (per-word α multiplies the probability COLUMN for key n, which
    #     commutes into the value row).

    def self_lane_qk(self, q: Array, k: Array) -> tuple:
        """Lane substitution for self-attn replace. q, k: [B, H, N, D]."""
        ctl = self.ctl
        s, d = self.src_lane, self.dst_lane
        win = jnp.logical_and(ctl.self_start <= self.step,
                              self.step < ctl.self_end)
        q = q.at[d].set(jnp.where(win, q[s], q[d]))
        k = k.at[d].set(jnp.where(win, k[s], k[d]))
        return q, k

    def cross_lane_out(self, out: Array, q: Array, k: Array, v: Array,
                       sdpa_fn) -> Array:
        """Rewrite the dst lane of a cross-attn output without probs.

        out/q/k/v: [B, H, N(q/k), D]; sdpa_fn(q, k, v) -> attention out.
        """
        ctl = self.ctl
        s, d = self.src_lane, self.dst_lane
        nk = k.shape[2]
        alpha = jax.lax.dynamic_index_in_dim(
            ctl.cross_alpha, self.step, keepdims=False)[:nk]
        alpha = alpha.astype(v.dtype)[None, :, None]          # [1, Nk, 1]
        mapper = ctl.mapper[:nk, :nk].astype(v.dtype)
        va = jnp.einsum("wn,hnd->hwd", mapper, v[d] * alpha)
        vb = v[d] * (1.0 - alpha)
        t1 = sdpa_fn(q[s:s + 1], k[s:s + 1], va[None])
        t2 = sdpa_fn(q[d:d + 1], k[d:d + 1], vb[None])
        return out.at[d].set((t1 + t2)[0])

    # -- explicit lane-sharded variants (multi-chip latency mode) --------
    #
    # Under a one-lane-per-chip sharding, GSPMD's generic lowering of
    # the row edits above moves ~6 full q-sized tensors per controlled
    # layer (measured from the compiled 8-device HLO: 3.8 GB/step).
    # The edits only NEED the src lane's q (and tiny cross-attn k) on
    # the dst chip, so these shard_map forms ppermute exactly those rows
    # and compute the edit locally on the dst chip — same math,
    # ~220 MB/step.

    def _lane_mesh_ok(self, mesh, axis, batch: int) -> bool:
        from omg_tpu.ops.flash_attention import _axis_size
        return _axis_size(mesh, axis) == batch   # one lane per chip

    def self_lane_qk_sharded(self, q: Array, k: Array, mesh, axis) -> tuple:
        """self_lane_qk with explicit ppermutes, window under lax.cond
        (outside the replace window NO communication happens at runtime
        — the generic form moved the rows on every step)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        ctl = self.ctl
        s, d = self.src_lane, self.dst_lane
        win = jnp.logical_and(ctl.self_start <= self.step,
                              self.step < ctl.self_end)
        spec = P(axis)

        def fn(win_, q_l, k_l):
            def sub(args):
                q_, k_ = args
                idx = jax.lax.axis_index(axis)
                q_s = jax.lax.ppermute(q_, axis, [(s, d)])
                k_s = jax.lax.ppermute(k_, axis, [(s, d)])
                keep = (idx != d)[None, None, None, None]
                return (jnp.where(keep, q_, q_s),
                        jnp.where(keep, k_, k_s))

            return jax.lax.cond(win_, sub, lambda a: a, (q_l, k_l))

        return shard_map(fn, mesh=mesh,
                         in_specs=(P(), spec, spec),
                         out_specs=(spec, spec), check_vma=False)(win, q, k)

    def cross_lane_out_sharded(self, out: Array, q: Array, k: Array,
                               v: Array, sdpa_fn, mesh, axis) -> Array:
        """cross_lane_out with explicit ppermutes of the src lane's q/k;
        the two-term edit computes on every chip (b=1, cheap) and only
        the dst chip keeps it."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        ctl = self.ctl
        s, d = self.src_lane, self.dst_lane
        nk = k.shape[2]
        alpha = jax.lax.dynamic_index_in_dim(
            ctl.cross_alpha, self.step, keepdims=False)[:nk]
        alpha = alpha.astype(v.dtype)[None, :, None]          # [1, Nk, 1]
        mapper = ctl.mapper[:nk, :nk].astype(v.dtype)
        spec = P(axis)

        def fn(out_l, q_l, k_l, v_l):
            idx = jax.lax.axis_index(axis)
            q_s = jax.lax.ppermute(q_l, axis, [(s, d)])
            k_s = jax.lax.ppermute(k_l, axis, [(s, d)])
            va = jnp.einsum("bhnd,wn->bhwd", v_l * alpha[None], mapper)
            vb = v_l * (1.0 - alpha)[None]
            t1 = sdpa_fn(q_s, k_s, va)
            t2 = sdpa_fn(q_l, k_l, vb)
            keep = (idx != d)[None, None, None, None]
            return jnp.where(keep, out_l, t1 + t2)

        return shard_map(fn, mesh=mesh,
                         in_specs=(spec, spec, spec, spec),
                         out_specs=spec, check_vma=False)(out, q, k, v)

"""Flash attention for SDXL self-attention, Pallas TPU.

The hot attention in this workload is the UNet's 4096-token (64x64
latent) self-attention: XLA materializes [B, H, 4096, 4096] fp32 score
matrices in HBM (the reference materializes them too, via its hooked
processors — src/pipelines/lora_pipeline.py:98-116). This kernel streams
K/V blocks through VMEM with the online-softmax recurrence, so HBM
traffic drops from O(N²) to O(N·D).

Design notes (per the Pallas TPU guide):
  * grid = (batch*heads, Nq/BQ); K/V for one (b, h) stay resident in
    VMEM (4096 x 64 bf16 = 512 KB) and are consumed in BK-sized tiles
    by a fori_loop — no DMA choreography needed at these sizes.
  * scores/accumulators in fp32 (softmax in bf16 loses the tail);
    matmuls hit the MXU via jnp.dot with preferred_element_type.
  * head_dim 64 under-fills the 128-lane tile; acceptable — the MXU
    contraction dim is what matters for these shapes.

No mask/causal support: diffusion attention is dense. Cross-attention
(77 text tokens) stays on the XLA path — nothing to win there.
"""

from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BQ = 512
DEFAULT_BK = 1024

# Trace-time counters: multi-chip dry runs assert the kernel path was
# actually taken (round 1 silently lost the kernel under lane sharding).
TRACE_STATS = {"flash_calls": 0, "shard_map_calls": 0, "seq_shard_calls": 0}

_lane_ctx = threading.local()


def _axis_size(mesh, axis) -> int:
    """Mesh extent of an axis name or tuple of names."""
    if axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


@contextlib.contextmanager
def lane_sharded(mesh, axis: str, *, interpret: bool = False):
    """Trace-time context: route sdpa's flash calls through shard_map.

    GSPMD cannot partition a Pallas custom call — under a lane-sharded
    batch it would all-gather the lanes onto every chip and run the
    kernel replicated (or bypass it, as round 1 did). Inside this
    context, eligible attention runs shard_map'd over ``axis``: each
    chip runs the kernel on its own lanes with zero collectives (lanes
    are independent through attention). ``interpret=True`` runs the
    kernel in Pallas interpreter mode — how CPU dry runs validate the
    composition on virtual device meshes.
    """
    prev = getattr(_lane_ctx, "spec", None)
    _lane_ctx.spec = (mesh, axis, interpret)
    try:
        yield
    finally:
        _lane_ctx.spec = prev


def lane_context():
    return getattr(_lane_ctx, "spec", None)


@contextlib.contextmanager
def seq_sharded(mesh, lane_axis, seq_axis, *, interpret: bool = False):
    """Trace-time context: route self-attention through the
    sequence-sharded flash path (the spatially-sharded stage-1 layout).

    The stage-1 multi-chip mode shards the latent's H axis over
    ``seq_axis`` (and the two CFG lanes over ``lane_axis``), so every
    conv/GEMM is token-parallel with replicated weights — the one op
    that mixes tokens is self-attention. Inside this context, eligible
    self-attention runs shard_map'd: each chip all-gathers K/V over
    ``seq_axis`` (the ONLY per-layer collective) and runs the flash
    kernel on its local query block against the full K/V.
    """
    prev = getattr(_lane_ctx, "seq_spec", None)
    _lane_ctx.seq_spec = (mesh, lane_axis, seq_axis, interpret)
    try:
        yield
    finally:
        _lane_ctx.seq_spec = prev


def seq_context():
    return getattr(_lane_ctx, "seq_spec", None)


def flash_attention_seq_sharded(q: Array, k: Array, v: Array, *, mesh,
                                lane_axis, seq_axis,
                                interpret: bool = False) -> Array:
    """Flash attention with the token axis shard_map'd over ``seq_axis``
    (and the batch axis over ``lane_axis``): q stays local per chip; K/V
    are all-gathered over the sequence shards — exact, no cross-chip
    softmax (the online-softmax runs per query block as usual)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    TRACE_STATS["seq_shard_calls"] += 1
    spec = P(lane_axis, None, seq_axis, None)

    def fn(q_, k_, v_):
        k_full = jax.lax.all_gather(k_, seq_axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_, seq_axis, axis=2, tiled=True)
        return flash_attention(q_, k_full, v_full, interpret=interpret)

    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)


def flash_attention_sharded(q: Array, k: Array, v: Array, *, mesh, axis: str,
                            interpret: bool = False) -> Array:
    """flash_attention with the batch (lane) axis shard_map'd over ``axis``."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    TRACE_STATS["shard_map_calls"] += 1
    spec = P(axis)
    fn = functools.partial(flash_attention, interpret=interpret)
    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, scale: float,
                  kv_len: int = 0):
    """``kv_len > 0``: only the first kv_len keys are real — the tail of
    the (padded-to-tile) KV range is masked to -inf before the softmax.
    Padding is a tail, so only blocks past kv_len // bk can contain it:
    the loop is split at that (static) boundary and the all-real prefix
    blocks run the unmasked fast path — no per-block VPU mask work for
    provably all-true masks (e.g. 3 of 4 blocks at 3952->4096/bk=1024).
    The masked tail still sees >=1 real key per row (kv_len > full*bk),
    so its block max is finite and the online softmax stays NaN-free
    even when the tail is the first block executed (kv_len < bk)."""
    q = q_ref[0].astype(jnp.float32) * scale          # [BQ, D]
    n_kv = k_ref.shape[1]
    bq, d = q.shape

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def make_body(masked: bool):
        def body(i, carry):
            m, l, acc = carry
            k = k_ref[0, pl.ds(i * bk, bk), :]        # [BK, D]
            v = v_ref[0, pl.ds(i * bk, bk), :]
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [BQ, BK]
            if masked:
                col = i * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 1)
                s = jnp.where(col < kv_len, s, -jnp.inf)
            m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p, v.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new
        return body

    n_blocks = n_kv // bk
    full = kv_len // bk if kv_len else n_blocks   # all-real prefix blocks
    carry = jax.lax.fori_loop(0, full, make_body(False), (m0, l0, acc0))
    if full < n_blocks:
        carry = jax.lax.fori_loop(full, n_blocks, make_body(True), carry)
    _, l, acc = carry
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("bq", "bk", "interpret"))
def flash_attention(q: Array, k: Array, v: Array, *,
                    bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK,
                    interpret: bool = False) -> Array:
    """Dense softmax attention. q: [B, H, Nq, D], k/v: [B, H, Nk, D].

    Non-128-aligned sequence lengths (the serving aspect buckets:
    1216x832 gives self-attention at 3952/988 tokens) are padded to the
    TPU tile here — padded KEYS are masked to -inf inside the kernel
    (``kv_len``; exactness is parity-tested vs XLA sdpa at odd
    lengths), padded QUERY rows compute discarded output. Before this,
    use_flash() refused unaligned shapes and the whole bucket fell back
    to XLA sdpa — the dominant share of the measured 29% bucket
    slowdown (PARITY §6 round-4 bucket row)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    # 128-aligned shapes run natively (pick() finds a dividing block —
    # e.g. 3840 at the 1536x640 bucket takes 256-blocks unpadded).
    # UNALIGNED shapes pad to a multiple of the preferred block, not
    # just the 128 tile: 3952 -> 3968 = 31x128 (31 prime) would force
    # bq=bk=128 and lose the tuned 512/1024 tiling; 3952 -> 4096 wastes
    # 3.6% masked FLOPs but keeps the fast blocks.
    def _pad_len(n: int) -> int:
        if n % 128 == 0:
            return n
        return _round_up(n, 512 if n >= 512 else 128)

    nq_p, nk_p = _pad_len(nq), _pad_len(nk)
    kv_len = nk if nk_p != nk else 0
    if nq_p != nq or nk_p != nk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))

    def pick(n, pref):
        for cand in (pref, 1024, 512, 256, 128):
            if cand <= n and n % cand == 0:
                return cand
        return n
    # Measured on v5e (vs XLA sdpa at SDXL shapes, b=8):
    #   nq=4096: bq=512/bk=1024 -> 5.1 ms vs 14.8 ms XLA (2.9x)
    #   nq=1024: bq=512/bk=1024 -> 0.29 ms vs 1.95 ms XLA (6.7x)
    # (bq=1024/bk=2048 is ~1.6% faster standalone at 4096 but overflows
    # the compiler's VMEM budget inside the full stage-2 program.)
    bq_ = pick(nq_p, bq)
    bk_ = pick(nk_p, bk)
    scale = d ** -0.5

    TRACE_STATS["flash_calls"] += 1
    qf = q.reshape(b * h, nq_p, d)
    kf = k.reshape(b * h, nk_p, d)
    vf = v.reshape(b * h, nk_p, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, bk=bk_, scale=scale,
                          kv_len=kv_len),
        grid=(b * h, nq_p // bq_),
        in_specs=[
            pl.BlockSpec((1, bq_, d), lambda ib, iq: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d), lambda ib, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d), lambda ib, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq_, d), lambda ib, iq: (ib, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_p * nk_p * d,
            bytes_accessed=(b * h * (nq_p + 2 * nk_p) * d
                            * q.dtype.itemsize
                            + b * h * nq_p * d * q.dtype.itemsize),
            transcendentals=b * h * nq_p * nk_p,
        ),
    )(qf, kf, vf)
    out = out.reshape(b, h, nq_p, d)
    return out[:, :, :nq] if nq_p != nq else out


def use_flash(nq: int, nk: int, head_dim: int, *,
              allow_interpret: bool = False,
              seq_local: bool = False) -> bool:
    """Trace-time routing: flash for large dense self-attention on TPU
    (or anywhere when the caller runs the kernel interpreted).

    ``seq_local``: nq is a PER-CHIP query block of a sequence-sharded
    self-attention (nq < nk is expected; the kernel's grid is over nq
    and its fori_loop over nk, so unequal extents are native)."""
    if jax.default_backend() != "tpu":
        if not allow_interpret:
            return False
        # interpret mode (CPU dry runs): no MXU tiling constraints —
        # engage on any square self-attention so tiny-geometry dry runs
        # execute the real kernel logic under shard_map
        if seq_local:
            return nq >= 1 and nk >= 4 and nk % 4 == 0
        return nq == nk and nq >= 4 and nq % 4 == 0
    # alignment is no longer required: flash_attention pads unaligned
    # sequences to the 128 tile and masks the padded keys in-kernel
    # (the aspect buckets' 3952/988-token self-attentions previously
    # fell back to XLA sdpa here)
    if seq_local:
        return nq >= 256 and head_dim in (64, 128)
    # GATE CHANGE (round 4): _round_up(nq, 128) >= 1024 instead of
    # nq >= 1024, so nq in [897, 1023] pads to 1024 and takes the
    # kernel. The lengths that actually occur there are the aspect
    # buckets' level-2 self-attentions — 988 (1216x832/832x1216,
    # measured: 4.60 vs 5.44 ms XLA at b=8 h=20), 960 (1536x640), and
    # 1008 (1152x896/1344x768 families) — all with <=6.7% masked
    # FLOPs, comfortably inside 988's measured 15% margin. Arbitrary
    # UNMEASURED lengths near 897 pay up to ~14% masked FLOPs and
    # could invert the win; if a non-bucket workload lives there,
    # re-measure before trusting this gate.
    return (nq == nk and _round_up(nq, 128) >= 1024
            and head_dim in (64, 128))

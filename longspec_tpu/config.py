"""Model and engine configuration.

Mirrors the capabilities of the reference (sail-sg/LongSpec) model stack
(`longspec/test/llama.py`, `longspec/test/qwen2.py`) with a single unified
config: the reference's Llama and Qwen2 rewrites differ only in attention
bias and defaults, so one dataclass covers both families.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """RoPE scaling spec, matching HF `config.rope_scaling` semantics
    (`transformers/modeling_rope_utils.py`): "linear" (position
    interpolation), "dynamic" (NTK-by-parts base stretch), "yarn", and
    "llama3" (frequency-band remap used by Llama-3.1+ long-context
    checkpoints — the reference's north-star model class)."""

    rope_type: str = "linear"
    factor: float = 1.0
    # llama3
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192
    # yarn
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    attention_factor: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of a Llama/Qwen2-family decoder-only transformer."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: Optional[int] = None  # defaults to hidden_size // num_heads
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    # Qwen2 uses attention bias on q/k/v; Llama does not
    # (reference: test/llama.py:79-82, test/qwen2.py).
    attention_bias: bool = False
    # Sliding-window self-attention for the TARGET: key j visible to query
    # at position p iff j >= p - sliding_window (span = window+1 keys incl.
    # self — flash-attn window_size=(w,-1) semantics, like the draft's
    # window), plus the first `attn_sinks` rows always (StreamingLLM sink
    # tokens). HF Mistral/Qwen2 masks `kv_idx > q_idx - sliding_window`
    # (span = sw), so convert.py maps HF checkpoints as sliding_window =
    # hf_sw - 1 for exact parity. None = full causal attention. This is the
    # attention-SPAN control that makes a model trained at seq L honest at
    # contexts >> L: decode-time spans never exceed the trained span.
    # Supported by dense/chunked/pallas paths; paged serving, the SP ring,
    # and the magicdec stream cache assume full attention (guarded).
    sliding_window: Optional[int] = None
    attn_sinks: int = 0
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 16384
    # pad/eos used by engines and collators. HF Llama-3.x instruct ships a
    # LIST of eos ids ([128001, 128009]); the first is the primary (buffer
    # fill value), the rest stop generation too (extra_eos_token_ids).
    pad_token_id: int = 0
    eos_token_id: int = 2
    extra_eos_token_ids: Tuple[int, ...] = ()

    @property
    def head_dim_(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads


@dataclasses.dataclass(frozen=True)
class DraftConfig:
    """GLIDE draft layer config (reference: test/llama_glide.py:23-72, 388-468).

    The draft is one decoder layer with sliding-window self-attention plus a
    cross-attention that reads the target model's last-layer KV cache. Its
    q/k/v projections always carry bias (reference `llama_glide.py:49-51`).
    """

    window: int = 512  # sliding-window size (reference flash window_size=(512,-1))
    anchors: int = 0   # attention-sink anchor tokens always visible (0 = parity)
    # Ring-buffer draft KV cache: the draft only ever attends `window` recent
    # rows + `anchors`, so its cache can be O(window) instead of O(context) —
    # the constant-memory design SURVEY §7.1.4 calls for (the reference
    # allocates a full-length draft buffer it never reads outside the window,
    # `llama_glide.py:223-224`). None = full-length buffer (parity layout);
    # an int = physical ring rows (engine validates slack; see
    # `glide.ring_positions`). At 262k context this turns ~1 GB of draft KV
    # into ~1 MB, replicated cheaply under SP.
    ring_size: Optional[int] = None
    # Cross-attention sliding window over the TARGET's last-layer KV
    # (+ always-visible sink rows). The reference's CA is unbounded
    # (`llama_glide.py:261-265`) — fine at its <=32k eval, but a draft
    # distilled at seq L never attended a span > L, so at contexts >> L an
    # unbounded CA dilutes over unseen span (the same failure the target's
    # sliding_window fixes). None = full-span parity.
    ca_window: Optional[int] = None
    ca_anchors: int = 0


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Speculative decoding engine configuration."""

    # Token tree: nodes per level (excluding the root). Reference default
    # `inference_long-bench.py:76`.
    tree_shape: Tuple[int, ...] = (4, 16, 16, 16, 16)
    # Chain speculation depth (reference `--gamma`, default 4).
    gamma: int = 4
    temperature: float = 0.0
    # Per-ROW traced temperature: the decode rounds read a [B] f32 `temps`
    # vector from the carry instead of baking `temperature` into the
    # compiled program, so a continuous-batching server can mix greedy and
    # stochastic requests in one batch without recompiling (serving sets a
    # row's temperature at admission). Rounds compute the greedy and
    # stochastic select/verify on the SAME shared logits and pick per row —
    # the extra cost is a top-k + the acceptance arithmetic, never a second
    # model forward. `temperature` remains the default for rows that don't
    # specify one (and for generate()). The reference has no serving layer
    # and compiles nothing, so this knob has no counterpart there.
    per_row_temperature: bool = False
    # Attention implementation: "dense" (oracle), "chunked" (pure-JAX flash,
    # runs anywhere), "pallas" (TPU kernels).
    attn_impl: str = "chunked"
    # MagicDec/StreamingLLM baseline cache geometry (reference
    # llama.py:255-262): 32 sink tokens + `magicdec_window` recent tokens.
    magicdec_sink: int = 32
    magicdec_window: int = 1024
    # DRAFT-side beam/proposal scoring head precision. "int8" reads a
    # per-column-scaled int8 copy of lm_head during draft micro-steps
    # (halving the dominant HBM read of each tree level); losslessness is
    # unaffected — q only selects proposals (and at T>0 the sampling and
    # verification q are the same quantized distribution). Target
    # VERIFICATION logits always stay full precision.
    draft_head: str = "bf16"  # "bf16" | "int8" | "int4"
    # DRAFT-layer matmul precision for decode-time proposal compute. "int8"
    # stores every 2-D draft kernel as per-output-channel-scaled int8 and
    # runs the projections as native int8 MXU matmuls with dynamic per-row
    # activation scales — halving the draft weight bytes re-read at every
    # tree level / chain micro-step. Proposal quality shifts slightly;
    # emitted tokens cannot (q only selects proposals; at T>0 sampling and
    # verification share the same quantized q). Training always uses the
    # full-precision params.
    draft_compute: str = "bf16"  # "bf16" | "int8" | "int4"
    # TARGET KV-cache storage precision. "int8" stores the cache as
    # symmetric-absmax int8 with per-row-per-head f32 scales
    # (`ops/quantkv.py`): half the HBM read per decode step and double the
    # context per chip. Spec-vs-vanilla token exactness is preserved by
    # construction (quantize-on-write / dequant-on-read + suffix
    # quant-dequant; see quantkv.py docstring) — but the quantized cache is
    # a (slightly) different target function than the bf16 cache, so outputs
    # differ from kv_quant="none" the way any serving-side KV quantization
    # does. Draft cache and training are untouched.
    kv_quant: str = "none"  # "none" | "int8"
    # O(window) TARGET KV ring cache (`ops/ring_cache.py`): with sliding-
    # window + sink decode attention, positions outside the window are
    # unreachable, so the cache holds `kv_ring` physical rows instead of
    # O(context) — a 262144-token windowed decode fits one 16GB chip with
    # GBs to spare (~0.7GB bf16 at window 12288 vs 8.6GB int8 full-length).
    # Requires cfg.sliding_window; capacity must cover
    # sinks + max(window, ca_window) + max writes per dispatch (validated).
    # Both arms of a comparison share the ring, so T=0 exactness holds by
    # the same shared-law argument as everything else.
    kv_ring: Optional[int] = None
    # Segmented prompt prefill: process the prompt in fixed-size segments,
    # each writing its KV rows first and then attending the cache under a
    # per-query causal bound (forward_append suffix_mask=None) — O(segment)
    # live activation memory instead of O(S). A 262144-token prefill of the
    # 2.5B bench model needs ~6.5GB of transients one-shot (fp32 attention
    # out + hidden + q); segmented at 8192 it needs ~0.4GB. None = one-shot.
    # Both loops of a comparison share whichever prefill mode is configured,
    # so its rounding is common-mode (cannot affect losslessness).
    prefill_seg: Optional[int] = None
    # Max prompt segments per DEVICE DISPATCH during segmented prefill.
    # The remote-TPU tunnel kills the worker under a single dispatch that
    # runs for many minutes (observed: the 32-segment 262144-token prefill,
    # ~7 min in one XLA program, died at ~6-7 min; a 24-segment one
    # survived). The engine therefore scans at most this many segments per
    # jitted call and loops on the host, donating the carry between calls —
    # same per-segment scan body, so results are bit-identical to the
    # single-dispatch scan. 0/None = never split.
    prefill_dispatch_segs: Optional[int] = 8
    # TARGET residual-stream precision for decode/verify forwards. "fp32"
    # (default) runs the hidden states of every decode-loop target forward
    # (vanilla step, chain/magicdec verify, tree verify) in fp32 with bf16
    # matmul inputs and fp32 accumulation — same HBM weight bytes, full-rate
    # MXU, negligible extra elementwise work at decode query counts (<= tree
    # size). Why: the T=1 vanilla step and the T=N verify step are different
    # XLA programs whose attention reductions split differently; with a bf16
    # residual stream their outputs differ by ~bf16 eps (~4e-3 relative),
    # enough to flip greedy argmax ties on near-converged logit margins and
    # break the T=0 losslessness gate (round-2 hard_8k row). With the fp32
    # stream the inter-law noise drops ~3 orders of magnitude below any
    # realistic top-2 margin. "native" keeps the parameter dtype end to end.
    # Prefill always runs native: both loops share one prefill program, so
    # its rounding is common-mode and cannot flip a comparison.
    decode_dtype: str = "fp32"  # "fp32" | "native"
    # ONE decode-loop target program for every method (the structural
    # losslessness guarantee): the vanilla step and the chain/magicdec
    # verifies run the SAME [B, tree_size]-shaped, barrier-isolated forward
    # the tree verify runs — identical jaxpr, identical shapes, so XLA
    # compiles the identical kernels and the arms of a T=0 comparison
    # compute the identical function BY CONSTRUCTION. Without this, the
    # T=1 and T=N programs fuse differently and their ~1e-6 reduction-order
    # noise flips one-ulp greedy argmax ties every few hundred tokens
    # (measured: hard_8k/chunked first_div at 159, margin 1 bf16 ulp;
    # hard_32k/chunked magicdec at 241). Cost: the vanilla/chain forwards
    # are tree-sized — bandwidth-bound at decode query counts, so the step
    # reads the same weight/KV bytes and pays only the extra FLOPs (a few
    # percent). False = minimal per-method shapes (maximum vanilla
    # throughput; cross-method exactness then rests on decode_dtype="fp32"
    # numerics alone, which is ulp-tie-fragile across shapes).
    uniform_decode_shape: bool = True
    # Beam top-k over the draft scoring logits at T=0. "approx" uses the
    # TPU-native approx_max_k (recall ~0.95, several x faster than the exact
    # sort-based TopK over V=32k+). Losslessness is structural either way —
    # the beam only chooses which tokens get PROPOSED; a missed top child
    # can only lower the accept rate, never change emitted tokens.
    beam_topk: str = "exact"  # "exact" | "approx"
    # T>0 tree PROPOSAL policy.
    #   "iid"  (default): children are i.i.d. samples from the draft's
    #     temperature-T distribution — the premise under which the residual
    #     verification walk (engine/verify.py) emits EXACTLY the target law.
    #   "topk": children are the top-k of the draft distribution, walked
    #     with the same residual verifier — the reference's T>0 behavior
    #     (`llama_glide.py:1177-1245`). Distinct children waste no tree
    #     slots on duplicate samples, so acceptance is higher, but the
    #     emitted distribution only APPROXIMATES the target law (top-k is
    #     not the proposal distribution the rejection test assumes).
    t_proposals: str = "iid"  # "iid" | "topk"
    # Decode/verify attention matmul-precision law (models.llama.
    # forward_append docstring): "bf16_pinned" = operands explicitly
    # rounded to bf16 with pinned casts (one MXU pass, deterministic — the
    # _mm activation law applied to the attention dots; measured green AND
    # 36% faster tree than "highest" on the hard_8k row, 311 vs 229 tok/s,
    # identical emitted trajectory); "highest" = exact f32 operands (6 MXU
    # passes) for strict-bitwise committed-cache mode; "high" = 3-pass f32
    # (XLA paths only — Mosaic has no HIGH dot lowering, so the pallas
    # kernel rejects it). All are arm-deterministic; they pick slightly
    # different target functions. See LOSSLESSNESS.md.
    decode_precision: str = "bf16_pinned"
    # Proposal sharpening for "iid" T>0 trees: children are sampled from
    # q' = softmax(draft_logp / (T * proposal_sharpness)) and the verifier
    # uses the SAME q' in its accept ratios, so any value stays EXACT
    # (rejection sampling is exact for every proposal distribution; only
    # acceptance rate changes). <1 concentrates proposals on the draft's
    # head — recovering most of top-k's no-duplicate benefit when the
    # target is peaked — while 1.0 proposes at the target temperature.
    proposal_sharpness: float = 1.0

    def __post_init__(self):
        # a typo'd kv_quant/draft precision would silently run (and label
        # itself as) the wrong configuration — reject at construction
        if self.kv_quant not in ("none", "int8"):
            raise ValueError(f"kv_quant must be 'none' or 'int8', "
                             f"got {self.kv_quant!r}")
        if self.draft_head not in ("bf16", "int8", "int4"):
            raise ValueError(f"draft_head must be bf16|int8|int4, "
                             f"got {self.draft_head!r}")
        if self.draft_compute not in ("bf16", "int8", "int4"):
            raise ValueError(f"draft_compute must be bf16|int8|int4, "
                             f"got {self.draft_compute!r}")
        if self.beam_topk not in ("exact", "approx"):
            raise ValueError(f"beam_topk must be exact|approx, "
                             f"got {self.beam_topk!r}")
        if self.decode_dtype not in ("fp32", "native"):
            raise ValueError(f"decode_dtype must be fp32|native, "
                             f"got {self.decode_dtype!r}")
        if self.decode_precision not in ("highest", "high", "bf16_pinned"):
            raise ValueError(f"decode_precision must be highest|high|"
                             f"bf16_pinned, got {self.decode_precision!r}")
        if self.decode_precision == "high" and self.attn_impl == "pallas":
            raise ValueError(
                "decode_precision='high' is XLA-only (Mosaic has no "
                "Precision.HIGH dot lowering) — use 'bf16_pinned' or "
                "'highest' with attn_impl='pallas'")
        if self.t_proposals not in ("iid", "topk"):
            raise ValueError(f"t_proposals must be iid|topk, "
                             f"got {self.t_proposals!r}")
        if self.t_proposals == "topk" and self.per_row_temperature:
            # the topk (reference-parity) proposal scheme needs one shared
            # temperature baked into the level walk; silently falling back
            # to iid would hand a user the wrong proposal law
            raise ValueError(
                "t_proposals='topk' is incompatible with "
                "per_row_temperature=True (topk bakes one shared "
                "temperature into the beam walk; per-row rounds sample "
                "iid proposals) — use t_proposals='iid'")
        if not (self.proposal_sharpness > 0.0):
            raise ValueError("proposal_sharpness must be > 0, "
                             f"got {self.proposal_sharpness!r}")

    @property
    def tree_size(self) -> int:
        """Total tree nodes including root."""
        return 1 + sum(self.tree_shape)

    @property
    def tree_depth(self) -> int:
        return len(self.tree_shape)

    @property
    def level_offsets(self) -> Tuple[int, ...]:
        """Start index of each level in the flattened tree; level 0 = root at 0.

        Matches the reference's `acc_num_per_step` prefix sums
        (`llama_glide.py:932-934`).
        """
        offs = [0, 1]
        for c in self.tree_shape:
            offs.append(offs[-1] + c)
        return tuple(offs)


# ---------------------------------------------------------------------------
# Presets mirroring the reference model registry (inference_long-bench.py:41-62)
# ---------------------------------------------------------------------------

def llama2_7b(max_pos: int = 16384) -> ModelConfig:
    """Vicuna-7b-v1.5-16k / LongChat-7b-v1.5-32k geometry."""
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32,
        rope_theta=10000.0, max_position_embeddings=max_pos,
    )


def llama2_13b(max_pos: int = 16384) -> ModelConfig:
    return ModelConfig(
        vocab_size=32000, hidden_size=5120, intermediate_size=13824,
        num_layers=40, num_heads=40, num_kv_heads=40,
        rope_theta=10000.0, max_position_embeddings=max_pos,
    )


def llama3_8b(max_pos: int = 262144) -> ModelConfig:
    """Llama-3-8B-Instruct-262k geometry (GQA)."""
    return ModelConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8,
        rope_theta=283461213.0, max_position_embeddings=max_pos,
        eos_token_id=128009,
    )


def qwen2_32b(max_pos: int = 32768) -> ModelConfig:
    """QwQ-32B-Preview geometry."""
    return ModelConfig(
        vocab_size=152064, hidden_size=5120, intermediate_size=27648,
        num_layers=64, num_heads=40, num_kv_heads=8,
        rope_theta=1000000.0, max_position_embeddings=max_pos,
        attention_bias=True, eos_token_id=151645,
    )


def tiny_test(vocab_size: int = 503, num_layers: int = 2) -> ModelConfig:
    """Small config for unit tests (CPU-runnable)."""
    return ModelConfig(
        vocab_size=vocab_size, hidden_size=64, intermediate_size=128,
        num_layers=num_layers, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, max_position_embeddings=2048,
        eos_token_id=1,
    )


DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}

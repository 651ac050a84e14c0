"""Int8-quantized KV cache (`EngineConfig.kv_quant="int8"`).

Long-context decoding is HBM-bound on KV reads; storing the target cache as
int8 with a per-row-per-head fp32 scale halves that traffic and doubles the
context a chip can hold (beyond the reference, whose cache is fp16/bf16 —
`llama.py:219-222`). Quantization is symmetric absmax over the head dim:

    scale = max|row| / 127,   q = round(row / scale)  (round-half-even)

Exactness contract — spec-vs-vanilla token equality still holds EXACTLY:
the quantized cache redefines the target's decode-time attention inputs,
and every method (vanilla / chain / tree / magicdec verification) must see
the same values for the same position. Three rules enforce that:

  1. quantize-on-write: rows enter the cache as int8 (`write_cache_rows`,
     `forward_prefill`), dequantized on every read;
  2. fresh suffix K/V are passed through quantize->dequantize BEFORE the
     suffix attention in `forward_append`, so a token's own (and its chain/
     tree siblings') keys are seen identically whether they are "fresh"
     (this step) or "cached" (any later step);
  3. the tree commit re-quantizes the RAW fresh rows (`collect_kv=True`
     returns unquantized K/V), which reproduces bit-identical ints to what
     a vanilla step would have written — quantization is a deterministic
     per-row function.

The draft cache stays bf16 (it is O(window) rows — ring buffer — so there
is nothing to win), as do training paths.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantKV:
    """An int8 KV cache tensor + its per-row scales.

    qv: int8 [..., S, D]; scale: float32 [..., S] (same leading axes).
    Indexing that does not touch the trailing D axis (layer selection
    `cache[-1]`, sequence slicing `cache[:, :, :s]`) applies to both.
    """

    __slots__ = ("qv", "scale")

    def __init__(self, qv, scale):
        self.qv = qv
        self.scale = scale

    def tree_flatten(self):
        return (self.qv, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.qv.shape

    @property
    def dtype(self):
        return self.qv.dtype

    def __getitem__(self, idx):
        return QuantKV(self.qv[idx], self.scale[idx])

    def __repr__(self):
        return f"QuantKV(qv={self.qv.shape}, scale={self.scale.shape})"


def alloc_quant_kv(shape) -> QuantKV:
    """Zero-initialized quantized cache; scale 0 dequantizes unwritten rows
    to exactly 0 (matching the bf16 cache's zero fill)."""
    return QuantKV(jnp.zeros(shape, jnp.int8),
                   jnp.zeros(shape[:-1], jnp.float32))


def quantize(x: jnp.ndarray):
    """x [..., D] -> (int8 [..., D], f32 scale [...]), symmetric absmax."""
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.round(xf / s[..., None]).astype(jnp.int8)
    return q, s


def quant_dequant(x: jnp.ndarray) -> jnp.ndarray:
    """The exact f32 values a reader of the quantized cache will see."""
    q, s = quantize(x)
    return q.astype(jnp.float32) * s[..., None]


def dequant(c: QuantKV, dtype=jnp.float32) -> jnp.ndarray:
    return c.qv.astype(dtype) * c.scale[..., None].astype(dtype)

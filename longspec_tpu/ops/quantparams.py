"""int8-quantized FROZEN model weights (`quantize_target_params`).

The reference fine-tunes drafts against a frozen base model and supports
loading that base in 8/4-bit to cut its memory (PEFT's
prepare_model_for_kbit_training glue, ref `train/models/mixin.py:34-120`).
The TPU-native equivalent: store every transformer-layer kernel as
symmetric per-output-channel int8 (`QuantParam`), dequantize at point of
use inside the layer body — under the layer `lax.scan`/unrolled pairs only
ONE layer's bf16 kernels are ever live, so the frozen target's HBM
residency halves (8B params: 16GB -> 8GB + one ~50MB transient).

This also serves decode: vanilla decoding is weight-read-bound, and an
int8-weight target halves that read (W8A16 serving). Quantized weights are
a (slightly) different model function — losslessness remains exact in the
spec-vs-vanilla sense because BOTH run the same quantized target, the same
contract as `kv_quant` (ops/quantkv.py).

Embeddings, lm_head, norms, and biases stay full precision (the standard
kbit `modules_to_not_convert` set; they are small or tied).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantParam:
    """One int8 weight: qv int8 [..., In, Out] + scale f32 [..., Out].

    Leading axes (the stacked-layer L) slice through `lax.scan` /
    `tree_map(lambda x: x[j], ...)` like any pytree of arrays.
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

    def __repr__(self):
        return f"QuantParam(qv={self.qv.shape}, scale={self.scale.shape})"


def quantize_param(w: jnp.ndarray) -> QuantParam:
    """Symmetric absmax int8 over the INPUT axis (-2): one f32 scale per
    output channel, the orientation every `jnp.dot(x, w)` here consumes."""
    wf = w.astype(jnp.float32)
    a = jnp.max(jnp.abs(wf), axis=-2)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.round(wf / s[..., None, :]).astype(jnp.int8)
    return QuantParam(q, s)


def dequant_param(p: QuantParam, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (p.qv.astype(jnp.float32) * p.scale[..., None, :]).astype(dtype)


# the transformer-layer kernels (models/llama.init_params "layers" dict);
# norms/biases stay full precision
_KERNELS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_target_params(params: dict) -> dict:
    """Quantize a target param tree's layer kernels to int8 in place of the
    bf16 tensors. Embed / lm_head / norms / biases pass through untouched.
    Works on stacked [L, In, Out] kernels (scan layout) — scales come out
    [L, Out]."""
    out = dict(params)
    out["layers"] = {
        k: quantize_param(v) if k in _KERNELS else v
        for k, v in params["layers"].items()
    }
    return out


def is_quantized_params(params: dict) -> bool:
    return any(isinstance(v, QuantParam) for v in params["layers"].values())

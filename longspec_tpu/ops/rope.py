"""Rotary position embeddings, numerically matching HF Llama/Qwen2.

The reference imports HF's `LlamaRotaryEmbedding` / `apply_rotary_pos_emb`
(`longspec/test/llama.py:35-42`); we reproduce the same split-half rotation
so converted checkpoints are bit-compatible in fp32.
"""
from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32):
    """cos/sin tables for given integer positions.

    positions: [...] int32 -> cos, sin: [..., head_dim] (half-frequencies
    duplicated, HF convention).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: [B, S, H, D]; cos/sin: [B, S, D] (broadcast over heads).
    Computation in fp32, result cast back to x.dtype.
    """
    xf = x.astype(jnp.float32)
    c = cos.astype(jnp.float32)[..., None, :]
    s = sin.astype(jnp.float32)[..., None, :]
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)


def apply_rope_qk(q, k, positions, head_dim, theta):
    """Convenience: RoPE q and k at integer positions [B, S]."""
    cos, sin = rope_cos_sin(positions, head_dim, theta)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)

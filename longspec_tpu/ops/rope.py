"""Rotary position embeddings, numerically matching HF Llama/Qwen2.

The reference imports HF's `LlamaRotaryEmbedding` / `apply_rotary_pos_emb`
(`longspec/test/llama.py:35-42`); we reproduce the same split-half rotation
so converted checkpoints are bit-compatible in fp32.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def scaled_inv_freq(head_dim: int, theta: float,
                    scaling=None) -> Tuple[np.ndarray, float]:
    """(inverse frequencies [head_dim//2], attention_factor) for a RoPE
    scaling spec (`config.RopeScaling`), matching HF
    `transformers/modeling_rope_utils.py` bit-for-bit in fp32.

    Static per config: computed in numpy at trace time and baked into the
    program as a constant.
    """
    half = head_dim // 2
    inv = 1.0 / (theta ** (np.arange(0, half, dtype=np.float32) * 2.0
                           / head_dim))
    if scaling is None or scaling.rope_type in ("default", "none"):
        return inv.astype(np.float32), 1.0
    t = scaling.rope_type
    if t == "linear":
        # position interpolation (/u/kaiokendev): pos/f == inv_freq/f
        return (inv / scaling.factor).astype(np.float32), 1.0
    if t == "dynamic":
        # NTK base stretch, baked for the fully-extended design length
        # seq_len = factor * original_max (static TPU graphs can't recompute
        # per-length like HF; the two coincide exactly at the design length)
        base = theta * (scaling.factor * scaling.factor
                        - (scaling.factor - 1)) ** (head_dim / (head_dim - 2))
        inv = 1.0 / (base ** (np.arange(0, half, dtype=np.float32) * 2.0
                              / head_dim))
        return inv.astype(np.float32), 1.0
    if t == "llama3":
        # frequency-band remap (Llama-3.1+): high-freq kept, low-freq
        # interpolated by `factor`, smooth ramp between
        lo_wl = scaling.original_max_position_embeddings / scaling.low_freq_factor
        hi_wl = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wavelen = 2 * math.pi / inv
        out = np.where(wavelen > lo_wl, inv / scaling.factor, inv)
        smooth = ((scaling.original_max_position_embeddings / wavelen
                   - scaling.low_freq_factor)
                  / (scaling.high_freq_factor - scaling.low_freq_factor))
        smoothed = (1 - smooth) * out / scaling.factor + smooth * out
        medium = ~(wavelen < hi_wl) & ~(wavelen > lo_wl)
        return np.where(medium, smoothed, out).astype(np.float32), 1.0
    if t == "yarn":
        f = scaling.factor
        omax = scaling.original_max_position_embeddings

        def corr_dim(n_rot):
            return (head_dim * math.log(omax / (n_rot * 2 * math.pi))
                    / (2 * math.log(theta)))

        low = max(math.floor(corr_dim(scaling.beta_fast)), 0)
        high = min(math.ceil(corr_dim(scaling.beta_slow)), head_dim - 1)
        ramp = np.clip((np.arange(half, dtype=np.float32) - low)
                       / max(high - low, 1e-3), 0, 1)
        extrap_w = 1.0 - ramp
        pos_freqs = theta ** (np.arange(0, half, dtype=np.float32) * 2.0
                              / head_dim)
        inv = (1.0 / (f * pos_freqs)) * (1 - extrap_w) \
            + (1.0 / pos_freqs) * extrap_w
        att = (scaling.attention_factor if scaling.attention_factor
               is not None else (0.1 * math.log(f) + 1.0 if f > 1 else 1.0))
        return inv.astype(np.float32), float(att)
    raise ValueError(f"unknown rope_type {t!r}")


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32, scaling=None):
    """cos/sin tables for given integer positions.

    positions: [...] int32 -> cos, sin: [..., head_dim] (half-frequencies
    duplicated, HF convention). `scaling` is an optional
    `config.RopeScaling` (linear/dynamic/yarn/llama3); yarn's
    attention_factor multiplies the tables, exactly as HF applies it.
    """
    inv_freq, att = scaled_inv_freq(head_dim, theta, scaling)
    freqs = positions.astype(jnp.float32)[..., None] * jnp.asarray(inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return ((jnp.cos(emb) * att).astype(dtype),
            (jnp.sin(emb) * att).astype(dtype))


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

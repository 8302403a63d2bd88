r"""
Transformer decoder stack (self-attention + cross-attention to visual tokens)
with an explicit KV-cache decode path.

Parity target: the reference uses ``nn.TransformerDecoder`` — gelu FFN,
post-norm (default) or pre-norm, BERT N(0, 0.02) init, causal future mask,
key-padding mask, cross-attention over the 49 projected visual tokens
(``virtex/modules/textual_heads.py:146-292``). TPU-native differences:

- attention is written as explicit einsums with fp32 softmax so XLA fuses the
  whole sublayer onto MXU+VPU (a Pallas fused-attention fast path hooks in at
  :func:`virtex_tpu.ops.attention.decoder_attention`);
- incremental decoding is a first-class method: per-layer K/V caches are
  plain arrays threaded functionally through ``lax``-friendly single-token
  steps — the reference instead re-runs the full prefix every timestep
  (``virtex/models/captioning.py:191-213``);
- masks are boolean and converted to additive −inf in fp32 at the softmax.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Cache = Dict[str, jnp.ndarray]

_dense_init = nn.initializers.normal(stddev=0.02)

NEG_INF = -1e9  # large-negative instead of -inf: safe under bf16/softmax


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, T, H = x.shape
    return x.reshape(B, T, num_heads, H // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, T, N, D = x.shape
    return x.reshape(B, T, N * D)


def attention_weights(q, k, mask, dtype):
    """(B,Tq,N,D)x(B,Tk,N,D) -> fp32 softmax -> (B,N,Tq,Tk) in dtype."""
    depth = q.shape[-1]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(depth))
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    return jax.nn.softmax(logits, axis=-1).astype(dtype)


class MultiHeadAttention(nn.Module):
    """QKV projections + scaled dot-product attention + output projection.

    The attention core dispatches to the fused Pallas kernel
    (:mod:`virtex_tpu.ops.attention`) on TPU — one VMEM-resident program per
    (batch, head) with in-kernel dropout — and falls back to the einsum path
    elsewhere (``use_pallas=None`` → auto)."""
    hidden_size: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: Any = None

    def setup(self):
        dense = lambda name: nn.Dense(
            self.hidden_size, kernel_init=_dense_init,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        self.query = dense("query")
        self.key = dense("key")
        self.value = dense("value")
        self.out = dense("out")
        self.drop = nn.Dropout(rate=self.dropout)

    def _use_fused(self) -> bool:
        from virtex_tpu.ops.attention import pallas_available
        return (self.use_pallas if self.use_pallas is not None
                else pallas_available())

    def __call__(self, q_in, kv_in, mask=None, deterministic: bool = True):
        q = _split_heads(self.query(q_in), self.num_heads)
        k = _split_heads(self.key(kv_in), self.num_heads)
        v = _split_heads(self.value(kv_in), self.num_heads)
        if self._use_fused():
            from virtex_tpu.ops.attention import fused_attention
            rate = 0.0 if deterministic else self.dropout
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, 2**31 - 1)
            ctx = fused_attention(q, k, v, mask, dropout_rate=rate,
                                  dropout_seed=seed)
            return self.out(_merge_heads(ctx.astype(self.dtype)))
        probs = attention_weights(q, k, mask, self.dtype)
        probs = self.drop(probs, deterministic=deterministic)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32)
        return self.out(_merge_heads(ctx.astype(self.dtype)))

    # -- KV-cache decode path ------------------------------------------------
    def project_kv(self, kv_in):
        """Precompute K/V (used once for cross-attention memory)."""
        k = _split_heads(self.key(kv_in), self.num_heads)
        v = _split_heads(self.value(kv_in), self.num_heads)
        return k, v

    def decode_self(self, q_in, k_cache, v_cache, position):
        """Single-token self-attention against a running cache.

        q_in: (B, 1, H); caches: (B, Tmax, N, D); position: scalar int32.
        Returns (out (B,1,H), k_cache, v_cache) with the caches updated at
        ``position``.
        """
        q = _split_heads(self.query(q_in), self.num_heads)
        k_new = _split_heads(self.key(q_in), self.num_heads)
        v_new = _split_heads(self.value(q_in), self.num_heads)
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_new.astype(k_cache.dtype), position, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_new.astype(v_cache.dtype), position, axis=1)
        Tmax = k_cache.shape[1]
        valid = (jnp.arange(Tmax) <= position)[None, None, None, :]
        probs = attention_weights(q, k_cache, valid, self.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v_cache,
                         preferred_element_type=jnp.float32)
        return self.out(_merge_heads(ctx.astype(self.dtype))), k_cache, v_cache

    def attend_kv(self, q_in, k, v):
        """Attention with precomputed K/V (cross-attention at decode)."""
        q = _split_heads(self.query(q_in), self.num_heads)
        probs = attention_weights(q, k, None, self.dtype)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32)
        return self.out(_merge_heads(ctx.astype(self.dtype)))


class FeedForward(nn.Module):
    hidden_size: int
    feedforward_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.feedforward_size, kernel_init=_dense_init,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="intermediate")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_size, kernel_init=_dense_init,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="output")(x)
        return x


class DecoderLayer(nn.Module):
    """One decoder block: self-attn → cross-attn(visual) → gelu FFN.

    ``norm_type='post'`` matches torch post-norm (default in the reference,
    ``textual_heads.py:181-194``); ``'pre'`` matches ``norm_first=True``.
    """
    hidden_size: int
    num_heads: int
    feedforward_size: int
    dropout: float = 0.1
    norm_type: str = "post"
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        mha = lambda name: MultiHeadAttention(
            self.hidden_size, self.num_heads, self.dropout, self.dtype,
            name=name)
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
            name=name)
        self.self_attn = mha("self_attn")
        self.cross_attn = mha("cross_attn")
        self.ffn = FeedForward(self.hidden_size, self.feedforward_size,
                               self.dropout, self.dtype, name="ffn")
        self.norm1, self.norm2, self.norm3 = ln("norm1"), ln("norm2"), ln("norm3")
        self.drop = nn.Dropout(rate=self.dropout)

    def _sub(self, norm, x, fn, deterministic):
        """Apply a sublayer with residual, in pre- or post-norm order."""
        if self.norm_type == "pre":
            y = fn(norm(x).astype(self.dtype))
            return x + self.drop(y, deterministic=deterministic)
        y = fn(x)
        return norm(x + self.drop(y, deterministic=deterministic)).astype(
            self.dtype)

    def __call__(self, x, visual, self_mask=None, deterministic: bool = True):
        x = self._sub(self.norm1, x,
                      lambda h: self.self_attn(h, h, self_mask, deterministic),
                      deterministic)
        x = self._sub(self.norm2, x,
                      lambda h: self.cross_attn(h, visual, None, deterministic),
                      deterministic)
        x = self._sub(self.norm3, x,
                      lambda h: self.ffn(h, deterministic), deterministic)
        return x

    def init_cache(self, visual, batch: int, max_length: int) -> Cache:
        """Build this layer's decode cache: empty self-attn K/V plus
        precomputed cross-attention K/V over the visual tokens."""
        num_heads = self.num_heads
        depth = self.hidden_size // num_heads
        zeros = jnp.zeros((batch, max_length, num_heads, depth), self.dtype)
        ck, cv = self.cross_attn.project_kv(visual)
        return {"k": zeros, "v": zeros, "ck": ck, "cv": cv}

    def decode(self, x, cache: Cache, position) -> Tuple[jnp.ndarray, Cache]:
        """Single-token step. x: (B, 1, H)."""
        det = True  # decode is always deterministic (inference)
        if self.norm_type == "pre":
            h = self.norm1(x).astype(self.dtype)
            y, k, v = self.self_attn.decode_self(
                h, cache["k"], cache["v"], position)
            x = x + y
            x = x + self.cross_attn.attend_kv(
                self.norm2(x).astype(self.dtype), cache["ck"], cache["cv"])
            x = x + self.ffn(self.norm3(x).astype(self.dtype), det)
        else:
            y, k, v = self.self_attn.decode_self(
                x, cache["k"], cache["v"], position)
            x = self.norm1(x + y).astype(self.dtype)
            x = self.norm2(
                x + self.cross_attn.attend_kv(x, cache["ck"], cache["cv"])
            ).astype(self.dtype)
            x = self.norm3(x + self.ffn(x, det)).astype(self.dtype)
        return x, {"k": k, "v": v, "ck": cache["ck"], "cv": cache["cv"]}


class TransformerDecoder(nn.Module):
    """Stack of :class:`DecoderLayer` (+ final LayerNorm iff pre-norm,
    mirroring ``textual_heads.py:190-194``)."""
    num_layers: int
    hidden_size: int
    num_heads: int
    feedforward_size: int
    dropout: float = 0.1
    norm_type: str = "post"
    dtype: jnp.dtype = jnp.bfloat16
    # Rematerialise each layer's activations in backward (jax.checkpoint):
    # trades recompute FLOPs for activation HBM — for deep/wide heads at
    # large batch. Bit-exact (same ops replayed, same dropout rng); the
    # param tree, decode path, and init_cache are untouched.
    remat: bool = False

    def setup(self):
        layer_cls = (nn.remat(DecoderLayer, static_argnums=(4,))
                     if self.remat else DecoderLayer)
        self.layers = [
            layer_cls(self.hidden_size, self.num_heads,
                      self.feedforward_size, self.dropout, self.norm_type,
                      self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        if self.norm_type == "pre":
            self.final_norm = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                name="final_norm")

    def __call__(self, x, visual, self_mask=None, deterministic: bool = True):
        for layer in self.layers:
            x = layer(x, visual, self_mask, deterministic)
        if self.norm_type == "pre":
            x = self.final_norm(x).astype(self.dtype)
        return x

    def init_cache(self, visual, batch: int, max_length: int):
        return [l.init_cache(visual, batch, max_length) for l in self.layers]

    def decode(self, x, caches, position):
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.decode(x, cache, position)
            new_caches.append(cache)
        if self.norm_type == "pre":
            x = self.final_norm(x).astype(self.dtype)
        return x, new_caches


def make_self_attention_mask(tokens: jnp.ndarray, lengths: jnp.ndarray,
                             causal: bool) -> jnp.ndarray:
    """Boolean (B, 1, T, T) mask combining key-padding (positions ≥ length
    masked, ``textual_heads.py:255-256``) with an optional causal future mask
    (``textual_heads.py:280-292``). True = attend."""
    B, T = tokens.shape
    key_valid = (jnp.arange(T)[None, :] < lengths[:, None])  # (B, T)
    mask = key_valid[:, None, None, :]  # broadcast over heads and queries
    if causal:
        causal_m = jnp.tril(jnp.ones((T, T), dtype=bool))
        mask = mask & causal_m[None, None, :, :]
    return mask

r"""
Textual heads: map visual features (+ optional caption tokens) to vocab
logits.

Parity target: ``virtex/modules/textual_heads.py:15-292``:

- :class:`LinearTextualHead` — global-average-pool the visual grid, single
  linear layer to vocab (used by token/multilabel classification tasks).
- :class:`TransformerTextualHead` — visual projection 2048→H, word+positional
  embedding, transformer decoder with cross-attention to the 49 visual
  tokens, output projection weight-tied to the word embedding
  (``textual_heads.py:199-200``).

TPU-native differences: the bidirectional variant owns BOTH direction
transformers inside one module so that the shared pieces (visual projection,
embedding, tied output) are shared *by construction* — the reference instead
deep-copies the head and re-assigns shared submodules after the fact
(``virtex/models/captioning.py:57-63``). Decoding uses the KV-cache path of
:class:`~virtex_tpu.modules.transformer.TransformerDecoder`.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from virtex_tpu.modules.embedding import WordAndPositionalEmbedding
from virtex_tpu.modules.transformer import (
    TransformerDecoder,
    make_self_attention_mask,
)

_dense_init = nn.initializers.normal(stddev=0.02)


class LinearTextualHead(nn.Module):
    """GAP over the visual grid → Linear to vocab
    (``textual_heads.py:46-95``)."""
    visual_feature_size: int
    vocab_size: int
    hidden_size: int = 0  # unused; kept for a uniform factory signature

    @nn.compact
    def __call__(self, visual_grid, caption_tokens=None, caption_lengths=None,
                 deterministic: bool = True):
        # visual_grid: (B, Hg, Wg, C) NHWC — pool the spatial grid.
        pooled = jnp.mean(visual_grid, axis=(1, 2))
        logits = nn.Dense(self.vocab_size, kernel_init=_dense_init,
                          param_dtype=jnp.float32, dtype=jnp.float32,
                          name="output")(pooled.astype(jnp.float32))
        return logits

    @property
    def textual_feature_size(self):
        return self.visual_feature_size


class TransformerTextualHead(nn.Module):
    """Autoregressive (or MLM) transformer head over projected visual tokens.

    ``bidirectional=True`` adds a second transformer stack trained on
    reversed captions, sharing projection/embedding/output with the forward
    stack (bicaptioning, ``captioning.py:57-63``).
    """
    visual_feature_size: int
    vocab_size: int
    hidden_size: int
    num_layers: int
    attention_heads: int
    feedforward_size: int
    dropout: float = 0.1
    norm_type: str = "post"  # 'post' | 'pre'
    mask_future_positions: bool = True
    max_caption_length: int = 30
    padding_idx: int = 0
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # per-layer activation remat (modules/transformer.py)

    def setup(self):
        self.visual_projection = nn.Dense(
            self.hidden_size, kernel_init=_dense_init,
            dtype=self.dtype, param_dtype=jnp.float32,
            name="visual_projection")
        self.embedding = WordAndPositionalEmbedding(
            self.vocab_size, self.hidden_size, self.dropout,
            self.max_caption_length, self.padding_idx, self.dtype,
            name="embedding")
        self.transformer = TransformerDecoder(
            self.num_layers, self.hidden_size, self.attention_heads,
            self.feedforward_size, self.dropout, self.norm_type, self.dtype,
            remat=self.remat, name="transformer")
        if self.bidirectional:
            self.backward_transformer = TransformerDecoder(
                self.num_layers, self.hidden_size, self.attention_heads,
                self.feedforward_size, self.dropout, self.norm_type,
                self.dtype, remat=self.remat, name="backward_transformer")
        # Output projection = embedding.attend (weight-tied) + bias.
        self.output_bias = self.param(
            "output_bias", nn.initializers.zeros, (self.vocab_size,),
            jnp.float32)

    # -- shared pieces -------------------------------------------------------
    def project_visual(self, visual_grid: jnp.ndarray) -> jnp.ndarray:
        """(B, Hg, Wg, C) NHWC grid → (B, Hg*Wg, hidden) visual tokens
        (reference projects the flattened 7×7 grid,
        ``textual_heads.py:240-245``)."""
        B, H, W, C = visual_grid.shape
        tokens = visual_grid.reshape(B, H * W, C).astype(self.dtype)
        return self.visual_projection(tokens)

    def output_logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        # Logits stay in the compute dtype: the tied-embedding matmul
        # already truncated its f32 accumulator to `dtype`, so upcasting
        # HERE adds no precision — it only doubles the HBM traffic of the
        # (B, T, 10000) tensors on the loss path. Losses/softmax upcast to
        # f32 at their (fused) reduction sites.
        logits = self.embedding.attend(hidden)
        return (logits.astype(jnp.float32)
                + self.output_bias).astype(logits.dtype)

    # -- training forward ----------------------------------------------------
    def __call__(self, visual_grid, caption_tokens, caption_lengths,
                 deterministic: bool = True, backward: bool = False):
        """Full-sequence forward: (B,Hg,Wg,C), (B,T), (B,) → (B,T,vocab)."""
        visual = self.project_visual(visual_grid)
        x = self.embedding(caption_tokens, deterministic=deterministic)
        mask = make_self_attention_mask(
            caption_tokens, caption_lengths, causal=self.mask_future_positions)
        stack = (self.backward_transformer if backward else self.transformer)
        x = stack(x, visual, mask, deterministic)
        if self.bidirectional and self.is_initializing() and not backward:
            # flax initializes lazily: make sure the backward stack's params
            # exist even when init traces only the forward direction.
            _ = self.backward_transformer(x, visual, mask, deterministic)
        return self.output_logits(x)

    # -- KV-cached decode ----------------------------------------------------
    def init_decode(self, visual_grid, max_length: Optional[int] = None):
        """Project visual features and build per-layer caches."""
        visual = self.project_visual(visual_grid)
        max_length = max_length or self.max_caption_length
        return self.transformer.init_cache(visual, visual.shape[0], max_length)

    def decode_step(self, token, position, caches):
        """One decode step: token (B,), scalar position, caches → logits
        (B, vocab), updated caches."""
        x = self.embedding(token[:, None], deterministic=True,
                           position_offset=position)
        x, caches = self.transformer.decode(x, caches, position)
        return self.output_logits(x[:, 0, :]), caches

    @property
    def textual_feature_size(self):
        return self.hidden_size

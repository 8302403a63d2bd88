r"""
Word + positional embedding for caption tokens.

Parity target: reference ``virtex/modules/embedding.py:7-86`` — learned word
embedding (padding row zero-initialised), learned positional embedding over
``max_caption_length`` positions, sum → LayerNorm(eps=1e-8) → dropout → zero
out embeddings at padded positions. The word table is also used (transposed)
as the weight-tied output projection (``textual_heads.py:199-200``), exposed
here as :meth:`attend`.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class WordAndPositionalEmbedding(nn.Module):
    vocab_size: int
    hidden_size: int
    dropout: float = 0.0
    max_caption_length: int = 30
    padding_idx: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        # BERT-style N(0, 0.02) init; the padding row starts at zero
        # (torch ``padding_idx`` semantics at init time).
        def word_init(key, shape, dtype):
            table = nn.initializers.normal(stddev=0.02)(key, shape, dtype)
            return table.at[self.padding_idx].set(0.0)

        self.words = nn.Embed(
            self.vocab_size, self.hidden_size, embedding_init=word_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="words")
        self.positions = nn.Embed(
            self.max_caption_length, self.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype, param_dtype=jnp.float32, name="positions")
        # LayerNorm in fp32 for numerical stability on TPU.
        self.layer_norm = nn.LayerNorm(
            epsilon=1e-8, dtype=jnp.float32, param_dtype=jnp.float32,
            name="layer_norm")
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True,
                 position_offset: int = 0) -> jnp.ndarray:
        r"""Embed ``tokens`` (B, T) -> (B, T, H).

        ``position_offset`` supports single-token KV-cached decoding, where
        T == 1 but the true position is the decode step.
        """
        T = tokens.shape[-1]
        pos_ids = jnp.arange(T, dtype=jnp.int32) + position_offset
        x = self.words(tokens) + self.positions(pos_ids)[None, :, :]
        x = self.layer_norm(x).astype(self.dtype)
        x = self.drop(x, deterministic=deterministic)
        # Zero embeddings at padded positions (reference embedding.py:65-73):
        # keeps pad positions exactly zero regardless of positional term.
        mask = (tokens != self.padding_idx)[..., None]
        return x * mask.astype(x.dtype)

    def attend(self, x: jnp.ndarray) -> jnp.ndarray:
        """Weight-tied output projection: (…, H) @ table^T -> (…, vocab)."""
        return self.words.attend(x.astype(self.dtype))

"""ViT image encoder — a TPU-native backbone beyond the reference's CNN
families.

The reference offers CNN-small / ResNet encoders only (`[RECALL]`
SURVEY.md section 1.3); this backbone is additive. Rationale for offering
it on TPU: patch embedding and attention are dense matmuls at every layer
— they run on the MXU at high arithmetic intensity regardless of spatial
resolution, avoid BatchNorm entirely (no cross-replica stats sync, no
train/eval asymmetry; LayerNorm is per-sample), and remat composes
cleanly per block. At 128×128/p16 the sequence is 64 tokens, so attention
cost is negligible next to the MLPs.

Design choices, TPU-first:
- mean-pool over tokens instead of a CLS token: one fewer ragged
  concatenate, and the pooled reduce fuses into the projection.
- learned positional embeddings sized by the (static) token count — the
  whole module is shape-static under jit.
- params float32, compute in the model dtype policy (bf16 path), like
  every other encoder here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TransformerBlock(nn.Module):
    """Pre-LN transformer block: LN → MHSA → +res, LN → MLP(GELU) → +res."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim,
            dtype=self.dtype, param_dtype=jnp.float32,
            deterministic=True, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp1")(y)
        # exact (erf) GELU: torchvision ViT semantics, so imported
        # vit_b_16-style weights reproduce torch forward outputs
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp2")(y)
        return x + y


class ViT(nn.Module):
    """Patch-embed → depth× TransformerBlock → LN → mean-pool → features.

    Accepts (B, H, W, C) with any channel count (temporal channel-stacking
    feeds 3·T channels straight into the patch conv). H and W must be
    multiples of `patch` (validated in ModelConfig)."""

    features: int                  # output embedding width (per camera)
    patch: int = 16
    dim: int = 384
    depth: int = 6
    heads: int = 6
    mlp_ratio: int = 4
    # "mean" pools over tokens (default: one fewer ragged concat, the
    # reduce fuses into the projection); "cls" prepends a class token and
    # reads it out -- the torchvision ViT convention, required for
    # imported vit_b_16-style weights (utils/torch_import.import_torch_vit)
    pool: str = "mean"
    dtype: Any = jnp.float32
    remat: bool = False            # jax.checkpoint each block

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(
                f"ViT input {h}x{w} not divisible by patch {self.patch}")
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x)
        if self.pool not in ("mean", "cls"):
            # the Config path validates this enum; guard direct module use
            # too (a typo'd pool would otherwise silently mean-pool)
            raise ValueError(f"ViT.pool must be 'mean' or 'cls', got "
                             f"{self.pool!r}")
        n = (h // self.patch) * (w // self.patch)
        x = x.reshape(b, n, self.dim)
        if self.pool == "cls":
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.dim), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)),
                 x], axis=1)
            n = n + 1
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02),
                         (1, n, self.dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(block_cls)
        for i in range(self.depth):
            x = block_cls(dim=self.dim, heads=self.heads,
                          mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                          name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln_out")(x)
        x = x[:, 0] if self.pool == "cls" else x.mean(axis=1)
        return nn.Dense(self.features, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(x)

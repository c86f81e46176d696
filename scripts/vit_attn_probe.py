#!/usr/bin/env python
"""Probe: can a custom attention layout beat flax MHA in the ViT step?

The r3 trace showed the ViT train step is ~63% copy/transpose -- attention
head split/merge relayouts around flax MultiHeadDotProductAttention's
einsums (docs/ROADMAP.md "ViT backbone tuning"). This probe swaps the
TransformerBlock's attention for two hand-laid-out variants and times the
FULL pr3-vit train step on the chip at the b=192 optimum:

  flax    -- baseline (nn.MultiHeadDotProductAttention)
  merged  -- one fused qkv matmul (B,N,3C), one relayout to (3,B*H,N,D),
             heads ride the leading batch dim through both batched
             matmuls, one relayout back
  bhnd    -- separate q/k/v, explicit transpose to (B,H,N,D), batched
             lax.dot_general with leading batch dims (0,1)

Usage: python scripts/vit_attn_probe.py --batch 192 --steps 30
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time
from typing import Any

# perf_probe is a scripts/ sibling
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import flax.linen as nn
import jax
import jax.numpy as jnp


def _mlp(x, dim, mlp_ratio, dtype):
    y = nn.Dense(dim * mlp_ratio, dtype=dtype, param_dtype=jnp.float32,
                 name="mlp1")(x)
    y = nn.gelu(y, approximate=False)
    return nn.Dense(dim, dtype=dtype, param_dtype=jnp.float32,
                    name="mlp2")(y)


class BlockMerged(nn.Module):
    """Fused qkv projection; heads folded into the leading batch dim."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        h = self.heads
        d = c // h
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(y)                      # (B,N,3C)
        qkv = qkv.reshape(b, n, 3, h, d)
        qkv = jnp.transpose(qkv, (2, 3, 0, 1, 4))          # (3,H,B,N,D)
        qkv = qkv.reshape(3, h * b, n, d)
        q, k, v = qkv[0], qkv[1], qkv[2]                   # (HB,N,D)
        scores = jax.lax.dot_general(
            q * (d ** -0.5), k,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (HB,N,N)
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        o = jax.lax.dot_general(
            w, v, (((2,), (1,)), ((0,), (0,))))            # (HB,N,D)
        o = o.reshape(h, b, n, d)
        o = jnp.transpose(o, (1, 2, 0, 3)).reshape(b, n, c)
        o = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="out")(o)
        x = x + o
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln2")(x)
        return x + _mlp(y, self.dim, self.mlp_ratio, self.dtype)


class BlockBHND(nn.Module):
    """Separate q/k/v; explicit (B,H,N,D); batch dims lead the matmuls."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        h = self.heads
        d = c // h

        def proj(name, z):
            z = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name=name)(z)
            return jnp.transpose(z.reshape(b, n, h, d), (0, 2, 1, 3))

        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln1")(x)
        q, k, v = proj("q", y), proj("k", y), proj("v", y)  # (B,H,N,D)
        scores = jax.lax.dot_general(
            q * (d ** -0.5), k,
            (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)             # (B,H,N,N)
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        o = jax.lax.dot_general(
            w, v, (((3,), (2,)), ((0, 1), (0, 1))))         # (B,H,N,D)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, c)
        o = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="out")(o)
        x = x + o
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln2")(x)
        return x + _mlp(y, self.dim, self.mlp_ratio, self.dtype)


def run(variant: str, per_chip: int, steps: int, warmup: int) -> dict:
    from rgb_proprioceptive_pose_estimator_tpu.models import vit as vitmod

    import perf_probe

    orig = vitmod.TransformerBlock
    if variant == "merged":
        vitmod.TransformerBlock = BlockMerged
    elif variant == "bhnd":
        vitmod.TransformerBlock = BlockBHND
    try:
        step, state, batches, _gb, _nd = perf_probe.build(
            per_chip, backbone="vit", unroll=8,
            copts={"xla_tpu_scoped_vmem_limit_kib": 32768})
        sec, _ = perf_probe.timeit(step, state, batches, steps=steps,
                                   warmup=warmup, unroll=8)
    finally:
        vitmod.TransformerBlock = orig
    ms = sec * 1000.0
    return {"variant": variant, "ms_per_step": round(ms, 3),
            "img_per_s": round(per_chip / sec, 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=192)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--variants", default="flax,merged,bhnd")
    args = p.parse_args()
    for v in args.variants.split(","):
        t0 = time.time()
        r = run(v.strip(), args.batch, args.steps, args.warmup)
        r["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

"""Sky segmentation network (UNet), replacing the HRNet-OCR docker sidecar
(``/root/reference/src/datasets/dataset.py:107-114``).

A compact encoder-decoder is plenty for binary sky masks at half resolution
(the reference also ran HRNet on half-res images). bfloat16 convs on the MXU;
the logits threshold at 0 -> boolean mask compatible with
``Dataset.get_sky_segmentation`` consumers.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        x = nn.relu(nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x))
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        return nn.relu(nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x))


class SkyUNet(nn.Module):
    base: int = 24
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(h, w, 3) image -> (h, w) sky logits. h, w must be /8."""
        x = x.astype(jnp.float32) / 127.5 - 1.0
        c1 = ConvBlock(self.base, self.dtype)(x)
        d1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
        c2 = ConvBlock(self.base * 2, self.dtype)(d1)
        d2 = nn.max_pool(c2, (2, 2), strides=(2, 2))
        c3 = ConvBlock(self.base * 4, self.dtype)(d2)
        d3 = nn.max_pool(c3, (2, 2), strides=(2, 2))
        c4 = ConvBlock(self.base * 8, self.dtype)(d3)

        u3 = jax.image.resize(c4, (c3.shape[0], c3.shape[1], c4.shape[-1]), "nearest")
        c5 = ConvBlock(self.base * 4, self.dtype)(
            jnp.concatenate([u3.astype(self.dtype), c3], axis=-1))
        u2 = jax.image.resize(c5, (c2.shape[0], c2.shape[1], c5.shape[-1]), "nearest")
        c6 = ConvBlock(self.base * 2, self.dtype)(
            jnp.concatenate([u2.astype(self.dtype), c2], axis=-1))
        u1 = jax.image.resize(c6, (c1.shape[0], c1.shape[1], c6.shape[-1]), "nearest")
        c7 = ConvBlock(self.base, self.dtype)(
            jnp.concatenate([u1.astype(self.dtype), c1], axis=-1))
        return nn.Conv(1, (1, 1), dtype=jnp.float32)(c7)[..., 0]


def create_sky_model(key: jax.Array = None,
                     image_hw: Tuple[int, int] = (256, 384)):
    if key is None:
        key = jax.random.PRNGKey(0)
    model = SkyUNet()
    dummy = jnp.zeros(image_hw + (3,), jnp.float32)
    params = model.init(key, dummy)
    return model, params


@jax.jit
def _sky_apply(params, img):
    return SkyUNet().apply(params, img)


def sky_mask(params, image: jax.Array) -> jax.Array:
    """(h, w, 3) -> (h, w) bool sky mask; pads to multiples of 8."""
    h, w = image.shape[:2]
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        image = jnp.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
    logits = _sky_apply(params, image)
    return logits[:h, :w] > 0.0


def sky_loss(params, model: SkyUNet, image, mask_gt):
    """Balanced sigmoid cross-entropy for binary sky masks."""
    logits = model.apply(params, image)
    labels = mask_gt.astype(jnp.float32)
    per_px = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pos = jnp.maximum(jnp.sum(labels), 1.0)
    neg = jnp.maximum(jnp.sum(1 - labels), 1.0)
    w = labels / pos + (1 - labels) / neg
    return jnp.sum(per_px * w)

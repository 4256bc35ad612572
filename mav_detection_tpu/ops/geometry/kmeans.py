"""K-means clustering as vmapped Lloyd iterations.

Replaces ``cv2.kmeans`` in the flow-magnitude clustering path
(``/root/reference/src/detector.py:396-428``): K=8, 10 attempts with random
centers, 10 Lloyd iterations per attempt, best compactness wins — but every
attempt runs in parallel under one jit instead of sequential C++ restarts.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "iters", "attempts"))
def kmeans(points: jax.Array, key: jax.Array, k: int = 8, iters: int = 10,
           attempts: int = 10) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cluster (N, D) points; returns (compactness, labels (N,), centers (k, D))."""
    n = points.shape[0]

    def one_attempt(subkey):
        init_idx = jax.random.choice(subkey, n, (k,), replace=False)
        centers0 = points[init_idx]

        def lloyd(_, centers):
            d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            labels = jnp.argmin(d2, axis=1)
            onehot = jax.nn.one_hot(labels, k, dtype=points.dtype)
            counts = jnp.sum(onehot, axis=0)
            sums = onehot.T @ points
            new_centers = sums / jnp.maximum(counts[:, None], 1.0)
            # empty clusters keep their previous center
            return jnp.where(counts[:, None] > 0, new_centers, centers)

        centers = jax.lax.fori_loop(0, iters, lloyd, centers0)
        d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        labels = jnp.argmin(d2, axis=1)
        compactness = jnp.sum(jnp.min(d2, axis=1))
        return compactness, labels, centers

    keys = jax.random.split(key, attempts)
    comps, labels_all, centers_all = jax.vmap(one_attempt)(keys)
    best = jnp.argmin(comps)
    return comps[best], labels_all[best], centers_all[best]


@functools.partial(jax.jit, static_argnames=("k",))
def cluster_image(img: jax.Array, key: jax.Array, k: int = 8
                  ) -> Tuple[jax.Array, jax.Array]:
    """Reference ``Detector.clustering`` behavior: cluster pixel intensities,
    rescale centers to [0, 255] by the max center, return the quantized image
    and the brightest-cluster mask (centers >= 225 after rescale)."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(-1, 1).astype(jnp.float32)
    _, labels, centers = kmeans(flat, key, k=k)
    max_c = jnp.maximum(jnp.max(centers), 1e-6)
    centers_u8 = jnp.round(centers * 255.0 / max_c)
    quantized = centers_u8[labels, 0].reshape(h, w)
    mask = quantized >= 225
    return quantized.astype(jnp.uint8), mask

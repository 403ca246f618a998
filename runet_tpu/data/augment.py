"""On-device jitted augmentation (SURVEY.md §2.1 "Augmentation").

Reference: host-side numpy/scipy transforms, exact set unverified (provenance
[DOMAIN] — flips + 90° rotations minimum, plus intensity jitter). TPU-native
design: the whole pipeline is a pure function of a PRNG key, vmapped over the
batch and fused by XLA into the step. Traced-boolean branches use
``jnp.where``/``lax.switch`` — no dynamic shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rand_flip(key, img, lab):
    keys = jax.random.split(key, 3)
    for axis in range(3):
        do = jax.random.bernoulli(keys[axis])
        img = jnp.where(do, jnp.flip(img, axis=axis), img)
        lab = jnp.where(do, jnp.flip(lab, axis=axis), lab)
    return img, lab


def _rand_rot90(key, img, lab):
    # Axial-plane (x, y) rotations; requires square in-plane patch.
    if img.shape[0] != img.shape[1]:
        return img, lab
    k = jax.random.randint(key, (), 0, 4)
    img = jax.lax.switch(k, [lambda a: jnp.rot90(a, i, axes=(0, 1)) for i in range(4)], img)
    lab = jax.lax.switch(k, [lambda a: jnp.rot90(a, i, axes=(0, 1)) for i in range(4)], lab)
    return img, lab


def _rand_intensity(key, img):
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (), minval=0.9, maxval=1.1)
    shift = jax.random.uniform(k2, (), minval=-0.1, maxval=0.1)
    noise = jax.random.normal(k3, img.shape, img.dtype) * 0.05
    return img * scale + shift + noise


def augment_one(key, img, lab):
    """img: (X, Y, Z, C) float; lab: (X, Y, Z) int."""
    k1, k2, k3 = jax.random.split(key, 3)
    img3, lab3 = img[..., 0], lab
    img3, lab3 = _rand_flip(k1, img3, lab3)
    img3, lab3 = _rand_rot90(k2, img3, lab3)
    img3 = _rand_intensity(k3, img3)
    return img3[..., None], lab3


@partial(jax.jit, donate_argnums=(1, 2))
def augment_batch(key, images, labels):
    """images: (B, X, Y, Z, C); labels: (B, X, Y, Z)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(augment_one)(keys, images, labels)

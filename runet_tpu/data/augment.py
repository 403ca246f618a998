"""On-device jitted augmentation (SURVEY.md §2.1 "Augmentation").

Reference: host-side numpy/scipy transforms, exact set unverified (provenance
[DOMAIN] — flips + 90° rotations minimum, plus intensity jitter). TPU-native
design: the whole pipeline is a pure function of a PRNG key, vmapped over the
batch and fused by XLA into the step. Traced-boolean branches use
``jnp.where``/``lax.switch`` — no dynamic shapes.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# Isotropic zoom factor bank for the scale augmentation (SURVEY.md §2.1
# "Augmentation ... possibly elastic/scale" [DOMAIN]). Includes 1.0 so the
# identity is in-distribution. factor > 1 samples a wider input extent
# (content shrinks, edge-clamped); factor < 1 magnifies the center.
ZOOM_FACTORS = (0.85, 0.90, 0.95, 1.0, 1.05, 1.10, 1.15)


@lru_cache(maxsize=64)
def _zoom_matrix_bank(n: int, factors: tuple[float, ...]) -> tuple[np.ndarray, np.ndarray]:
    """Stacked (K, n, n) center-aligned interpolation matrices.

    Row j of matrix k samples input coordinate c + (j - c)·factor[k]
    (c = center), clamped to [0, n-1] — same ≤2-nonzeros-per-row dense-matmul
    formulation as preprocess/resample.py, so the traced-factor zoom is a
    gather of ONE (n, n) matrix from a constant bank followed by MXU matmuls.
    """
    from runet_tpu.preprocess.resample import matrix_from_positions

    c = (n - 1) / 2.0
    rows = np.arange(n)
    lin, nst = [], []
    for f in factors:
        pos = np.clip(c + (rows - c) * float(f), 0.0, float(n - 1))
        lin.append(matrix_from_positions(pos, n, "linear"))
        nst.append(matrix_from_positions(pos, n, "nearest"))
    return np.stack(lin), np.stack(nst)


def _zoom_axis(x, axis, W):
    """out[..., j, ...] = Σ_i W[j, i]·x[..., i, ...]; W may be traced."""
    n = x.shape[axis]
    moved = jnp.moveaxis(x, axis, 0).reshape(n, -1)
    out = jnp.dot(W, moved.astype(jnp.float32), preferred_element_type=jnp.float32)
    new_shape = (W.shape[0],) + tuple(s for a, s in enumerate(x.shape) if a != axis)
    return jnp.moveaxis(out.reshape(new_shape), 0, axis)


def _rand_zoom(key, img, lab, factors=ZOOM_FACTORS):
    """Isotropic random scale; trilinear for image, nearest for labels."""
    k = jax.random.randint(key, (), 0, len(factors))
    out_img, out_lab = img, lab
    lab_f = lab.astype(jnp.float32)
    for axis in range(3):
        lin_bank, nst_bank = _zoom_matrix_bank(img.shape[axis], factors)
        Wl = jnp.asarray(lin_bank)[k]
        Wn = jnp.asarray(nst_bank)[k]
        out_img = _zoom_axis(out_img, axis, Wl)
        lab_f = _zoom_axis(lab_f, axis, Wn)
    # Nearest matrices are one-hot rows: values stay exact class ids.
    out_lab = jnp.round(lab_f).astype(lab.dtype)
    return out_img, out_lab


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


@lru_cache(maxsize=32)
def _field_upsample_matrix(n: int, g: int) -> np.ndarray:
    """(n, g) linear-interpolation matrix from a g-point control grid whose
    endpoints sit on the volume boundary. Static, so the elastic field
    upsample is three small MXU matmuls (same formulation as _zoom_matrix_bank
    / preprocess.resample — no gathers until the final warp)."""
    from runet_tpu.preprocess.resample import matrix_from_positions

    pos = np.arange(n) * (g - 1) / (n - 1)
    return matrix_from_positions(pos, g, "linear")


def _rand_elastic(key, img, lab, grid: int = 4, alpha: tuple[float, float] = (0.0, 8.0)):
    """Elastic deformation (SURVEY.md §2.1 "possibly elastic/scale" [DOMAIN]).

    TPU-first shape: sample a coarse (3, g, g, g) normal displacement field,
    upsample it to full resolution with static per-axis interpolation
    matrices (MXU matmuls — inherently smooth, replacing the reference
    family's gaussian_filter over white noise), scale by a random amplitude
    in voxels, and warp with ONE trilinear map_coordinates for the image and
    a nearest (rounded-coordinate) variant for labels. The amplitude range
    starts at 0 so the identity stays in-distribution; coordinates are
    clamped to the volume (edge-replicate, matching the zoom's edge policy).
    """
    kf, ka = jax.random.split(key)
    g = grid
    field = jax.random.normal(kf, (3, g, g, g), jnp.float32)
    amp = jax.random.uniform(ka, (), minval=alpha[0], maxval=alpha[1])
    disp = field * amp
    for axis in range(3):
        M = jnp.asarray(_field_upsample_matrix(img.shape[axis], g))
        disp = _zoom_axis(disp, axis + 1, M)
    coords = [
        jnp.clip(
            jnp.arange(img.shape[a], dtype=jnp.float32).reshape(
                [-1 if i == a else 1 for i in range(3)]
            )
            + disp[a],
            0.0,
            img.shape[a] - 1.0,
        )
        for a in range(3)
    ]
    # Same warp for every channel ((X, Y, Z, C) input; plain (X, Y, Z) works
    # too — rank is static under jit).
    if img.ndim == 4:
        img_w = jax.vmap(
            lambda ch: jax.scipy.ndimage.map_coordinates(ch, coords, order=1),
            in_axes=-1,
            out_axes=-1,
        )(img)
    else:
        img_w = jax.scipy.ndimage.map_coordinates(img, coords, order=1)
    lab_w = jax.scipy.ndimage.map_coordinates(
        lab, [jnp.round(c) for c in coords], order=0
    )
    return img_w, lab_w


def _rand_intensity(key, img):
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (), minval=0.9, maxval=1.1)
    shift = jax.random.uniform(k2, (), minval=-0.1, maxval=0.1)
    noise = jax.random.normal(k3, img.shape, img.dtype) * 0.05
    return img * scale + shift + noise


def augment_one(key, img, lab, zoom: bool = True, elastic: bool = False):
    """img: (X, Y, Z, C) float; lab: (X, Y, Z) int.

    All C channels share one geometric transform (flip/rot/zoom/elastic act
    on spatial axes 0-2 with the channel axis carried along — a squeeze to
    channel 0 here once silently DROPPED extra channels); intensity jitter
    applies to every channel."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    img4, lab3 = img, lab
    img4, lab3 = _rand_flip(k1, img4, lab3)
    img4, lab3 = _rand_rot90(k2, img4, lab3)
    if zoom:
        img4, lab3 = _rand_zoom(k4, img4, lab3)
    if elastic:
        img4, lab3 = _rand_elastic(k5, img4, lab3)
    img4 = _rand_intensity(k3, img4)
    return img4, lab3


@partial(jax.jit, donate_argnums=(1, 2), static_argnames=("zoom", "elastic"))
def augment_batch(key, images, labels, zoom: bool = True, elastic: bool = False):
    """images: (B, X, Y, Z, C); labels: (B, X, Y, Z)."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(partial(augment_one, zoom=zoom, elastic=elastic))(keys, images, labels)

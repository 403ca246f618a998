"""Pallas kernel parity tests vs pure-XLA references (SURVEY.md §4.2).

Run in interpret mode on CPU; the same code path compiles on TPU (exercised
by bench/verify drives on the real chip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from runet_tpu.kernels.attic.fused_norm import (
    fused_instance_norm_lrelu,
    reference_instance_norm_lrelu,
)


@pytest.mark.parametrize("shape", [(2, 8, 8, 8, 32), (1, 4, 4, 32, 128)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_norm_parity(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, size=shape), dtype)
    C = shape[-1]
    scale = jnp.asarray(rng.normal(1.0, 0.1, size=(C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.1, size=(C,)), jnp.float32)
    got = fused_instance_norm_lrelu(x, scale, bias, interpret=True)
    want = reference_instance_norm_lrelu(x, scale, bias)
    assert got.shape == x.shape and got.dtype == x.dtype
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )


@pytest.mark.parametrize("shape,td", [((8, 6, 10, 16), 4), ((4, 5, 7, 32), 2)])
def test_v3_deep_parity(shape, td):
    """v3 channels-on-lanes deep-level conv (attic/conv_v3_deep.py): parity
    of the padded-flattened tap-view formulation vs the NDHWC oracle,
    including the inter-plane filler-row masking and the Σy/Σy² stats."""
    from runet_tpu.kernels.attic.conv_v3_deep import (
        conv3x3_v3,
        reference_conv3x3_ndhwc,
    )

    rng = np.random.default_rng(2)
    D, H, W, C = shape
    x = jnp.asarray(rng.normal(size=(D, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.float32)
    y, s, q = conv3x3_v3(x, w, interpret=True, TD=td, BM=64)
    yr, sr, qr = reference_conv3x3_ndhwc(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=1e-4)


def test_fused_norm_matches_module_oracle():
    # Same semantics as models/norm.py InstanceNorm (affine).
    from runet_tpu.models.norm import InstanceNorm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8, 32)), jnp.float32)
    m = InstanceNorm(affine=True)
    variables = m.init(jax.random.key(0), x)
    module_out = m.apply(variables, x)
    module_out = jnp.where(module_out >= 0, module_out, module_out * 1e-2)
    scale = variables["params"]["scale"]
    bias = variables["params"]["bias"]
    got = fused_instance_norm_lrelu(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(module_out), atol=1e-5)

"""Pallas 3x3 conv kernel (ops/conv3x3.py): interpret-mode equivalence to
lax.conv, multi-row-block halo correctness, the custom-vjp backward, and
the ResnetBlock2D conv_impl dispatch (param-tree identity + output match).

Reference analogue: the torch Conv2d calls inside diffusers ResnetBlock2D
as instantiated by /root/reference/src/models/unet_motion_cross_frame_attn.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2v_adapter_tpu.ops.conv3x3 import (
    _conv3x3_ref,
    conv3x3,
    conv3x3_pallas,
    conv3x3_supported,
)


@pytest.mark.parametrize(
    "shape,rows",
    [
        ((2, 8, 8, 128, 320), 0),
        ((1, 8, 16, 320, 320), 0),
        ((2, 4, 4, 640, 1280), 0),
        ((1, 16, 8, 128, 128), 4),  # 4 row blocks: halo + edge masks
        ((1, 16, 8, 128, 128), 2),  # 8 row blocks
        ((2, 12, 8, 136, 264), 4),  # non-pow2 dims
    ],
)
def test_conv3x3_matches_lax_conv(rng, shape, rows):
    b, h, w, c, co = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(
        (rng.standard_normal((3, 3, c, co)) / (3 * c) ** 0.5).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    ref = _conv3x3_ref(x, k, bias)
    got = conv3x3_pallas(x, k, bias, interpret=True, rows=rows)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_conv3x3_backward_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))
    k = jnp.asarray(
        (rng.standard_normal((3, 3, 128, 128)) / 20).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    g1 = jax.grad(
        lambda *a: jnp.sum(conv3x3(*a, True) ** 2), argnums=(0, 1, 2)
    )(x, k, bias)
    g2 = jax.grad(
        lambda *a: jnp.sum(_conv3x3_ref(*a) ** 2), argnums=(0, 1, 2)
    )(x, k, bias)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), rtol=1e-4, atol=1e-3
        )


def test_conv3x3_supported_gate(rng):
    ok = jnp.zeros((2, 8, 8, 320))
    assert conv3x3_supported(ok, jnp.zeros((3, 3, 320, 320)))
    # shallow channels: MXU contraction too thin — XLA path
    assert not conv3x3_supported(
        jnp.zeros((2, 8, 8, 4)), jnp.zeros((3, 3, 4, 320))
    )
    # not a 3x3
    assert not conv3x3_supported(ok, jnp.zeros((1, 1, 320, 320)))


def test_resnet_block_conv_impl_dispatch(rng):
    """conv_impl='pallas' (interpret off-TPU) == conv_impl='xla' at the
    model level, with an IDENTICAL param tree (same flax paths, same
    init values), so checkpoints interchange freely."""
    from i2v_adapter_tpu.models.layers import ResnetBlock2D

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))

    ref_mod = ResnetBlock2D(out_channels=128, conv_impl="xla")
    pal_mod = ResnetBlock2D(out_channels=128, conv_impl="pallas")
    p_ref = ref_mod.init(jax.random.PRNGKey(0), x, temb)
    p_pal = pal_mod.init(jax.random.PRNGKey(0), x, temb)
    flat_ref = jax.tree_util.tree_leaves_with_path(p_ref)
    flat_pal = jax.tree_util.tree_leaves_with_path(p_pal)
    assert [p for p, _ in flat_ref] == [p for p, _ in flat_pal]
    for (_, a), (_, b) in zip(flat_ref, flat_pal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_ref = ref_mod.apply(p_ref, x, temb)
    out_pal = pal_mod.apply(p_ref, x, temb)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_ref), rtol=1e-5, atol=1e-4
    )


def test_conv3x3_single_row_blocks(rng):
    """rows=1 (the wide-VAE-image blocking): every dy tap borrows a whole
    neighbor block; exercises the zero-size-center guard."""
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 128)).astype(np.float32))
    k = jnp.asarray(
        (rng.standard_normal((3, 3, 128, 128)) / 20).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    ref = _conv3x3_ref(x, k, bias)
    got = conv3x3_pallas(x, k, bias, interpret=True, rows=1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_gn_silu_conv3x3_matches_ref(rng):
    """Fused conv(silu(x*a + s)) == the XLA composition, multi row block."""
    from i2v_adapter_tpu.ops.conv3x3 import (
        _gn_silu_conv3x3_ref,
        gn_silu_conv3x3,
    )

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)).astype(np.float32))
    k = jnp.asarray(
        (rng.standard_normal((3, 3, 128, 128)) / 20).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    a = jnp.asarray((rng.random((2, 128)) + 0.5).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    ref = _gn_silu_conv3x3_ref(x, a, s, k, bias)
    got = gn_silu_conv3x3(x, a, s, k, bias, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )
    # backward through the custom vjp
    g1 = jax.grad(
        lambda *t: jnp.sum(gn_silu_conv3x3(*t, True) ** 2),
        argnums=(0, 1, 2, 3, 4),
    )(x, a, s, k, bias)
    g2 = jax.grad(
        lambda *t: jnp.sum(_gn_silu_conv3x3_ref(*t) ** 2),
        argnums=(0, 1, 2, 3, 4),
    )(x, a, s, k, bias)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-3
        )


def test_resnet_fused_path_matches_groupnorm_module(rng):
    """conv_impl='pallas' resnet (fused gn+silu+conv kernel, matmul stats)
    == conv_impl='xla' resnet (nn.GroupNorm + nn.silu + nn.Conv)."""
    from i2v_adapter_tpu.models.layers import ResnetBlock2D

    x = jnp.asarray(
        (rng.standard_normal((2, 8, 8, 128)) * 2 + 0.5).astype(np.float32)
    )
    temb = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    ref_mod = ResnetBlock2D(out_channels=128, groups=8, conv_impl="xla")
    pal_mod = ResnetBlock2D(out_channels=128, groups=8, conv_impl="pallas")
    p = ref_mod.init(jax.random.PRNGKey(1), x, temb)
    out_ref = ref_mod.apply(p, x, temb)
    out_pal = pal_mod.apply(p, x, temb)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_ref), rtol=1e-4, atol=1e-4
    )

"""Numerical parity of converted primitives against torch.nn.

The environment has no diffusers, so golden tests run at the primitive
level: identical weights through the converter's transforms must give
matching outputs for Linear / Conv2d(NCHW vs NHWC) / GroupNorm / LayerNorm /
scaled-dot-product attention.  These pin down every weight-layout convention
the full-model converter relies on (SURVEY.md §7.3 risk #1)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

RTOL, ATOL = 2e-5, 2e-5


def test_linear(rng):
    lin = torch.nn.Linear(8, 16)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    with torch.no_grad():
        want = lin(torch.from_numpy(x)).numpy()
    params = {
        "params": {
            "kernel": lin.weight.detach().numpy().T,
            "bias": lin.bias.detach().numpy(),
        }
    }
    got = nn.Dense(16).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, 1)])
def test_conv2d_nchw_to_nhwc(rng, stride, pad):
    conv = torch.nn.Conv2d(3, 8, 3, stride=stride, padding=pad)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()  # NCHW
    params = {
        "params": {
            "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": conv.bias.detach().numpy(),
        }
    }
    got = nn.Conv(8, (3, 3), strides=(stride, stride), padding=pad).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL
    )


def test_vae_asymmetric_downsample(rng):
    """VAE encoder downsample: torch pads (0,1,0,1) then conv stride 2."""
    conv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        xp = torch.nn.functional.pad(torch.from_numpy(x), (0, 1, 0, 1))
        want = conv(xp).numpy()
    from i2v_adapter_tpu.models.layers import Downsample2D

    params = {
        "params": {
            "conv": {
                "kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
                "bias": conv.bias.detach().numpy(),
            }
        }
    }
    got = Downsample2D(4, asymmetric_pad=True).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL
    )


def test_groupnorm(rng):
    gn = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
        gn.bias.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
    x = rng.standard_normal((2, 16, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = gn(torch.from_numpy(x)).numpy()
    params = {
        "params": {
            "scale": gn.weight.detach().numpy(),
            "bias": gn.bias.detach().numpy(),
        }
    }
    got = nn.GroupNorm(num_groups=4, epsilon=1e-5).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=RTOL, atol=1e-4
    )


def test_temporal_groupnorm_convention(rng):
    """The motion module norms (B, C, F, H, W) — grouping over C, stats over
    (C/g, F, H, W).  Our TemporalTransformer reshapes to (B, F*H*W, C); flax
    GroupNorm must produce identical stats."""
    b, c, f, h, w = 2, 8, 3, 2, 2
    gn = torch.nn.GroupNorm(4, c, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(rng.standard_normal(c).astype(np.float32)))
        gn.bias.copy_(torch.from_numpy(rng.standard_normal(c).astype(np.float32)))
    x = rng.standard_normal((b, c, f, h, w)).astype(np.float32)
    with torch.no_grad():
        want = gn(torch.from_numpy(x)).numpy()
    params = {
        "params": {"scale": gn.weight.detach().numpy(), "bias": gn.bias.detach().numpy()}
    }
    # our layout: (B, F*H*W, C)
    x_flax = x.transpose(0, 2, 3, 4, 1).reshape(b, f * h * w, c)
    got = nn.GroupNorm(num_groups=4, epsilon=1e-6).apply(params, jnp.asarray(x_flax))
    got = np.asarray(got).reshape(b, f, h, w, c).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=1e-4)


def test_layernorm(rng):
    ln = torch.nn.LayerNorm(16, eps=1e-5)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
        ln.bias.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
    x = rng.standard_normal((3, 5, 16)).astype(np.float32)
    with torch.no_grad():
        want = ln(torch.from_numpy(x)).numpy()
    params = {
        "params": {"scale": ln.weight.detach().numpy(), "bias": ln.bias.detach().numpy()}
    }
    got = nn.LayerNorm(epsilon=1e-5).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=1e-4)


def test_attention_module_vs_torch_sdpa(rng):
    """Our Attention module with converted projection weights must match
    torch F.scaled_dot_product_attention with the same projections."""
    from i2v_adapter_tpu.models.attention import Attention

    dim, heads = 16, 2
    tq = torch.nn.Linear(dim, dim, bias=False)
    tk = torch.nn.Linear(dim, dim, bias=False)
    tv = torch.nn.Linear(dim, dim, bias=False)
    to = torch.nn.Linear(dim, dim)
    x = rng.standard_normal((2, 6, dim)).astype(np.float32)
    ctx = rng.standard_normal((2, 4, dim)).astype(np.float32)
    with torch.no_grad():
        q = tq(torch.from_numpy(x)).reshape(2, 6, heads, dim // heads).transpose(1, 2)
        k = tk(torch.from_numpy(ctx)).reshape(2, 4, heads, dim // heads).transpose(1, 2)
        v = tv(torch.from_numpy(ctx)).reshape(2, 4, heads, dim // heads).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(2, 6, dim)
        want = to(o).numpy()
    params = {
        "params": {
            "to_q": {"kernel": tq.weight.detach().numpy().T},
            "to_k": {"kernel": tk.weight.detach().numpy().T},
            "to_v": {"kernel": tv.weight.detach().numpy().T},
            "to_out": {
                "kernel": to.weight.detach().numpy().T,
                "bias": to.bias.detach().numpy(),
            },
        }
    }
    got = Attention(heads=heads, dim_head=dim // heads, attn_impl="xla").apply(
        params, jnp.asarray(x), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_geglu_ff_vs_torch(rng):
    """GEGLU: torch diffusers splits proj output into (value, gate) and
    computes value * gelu(gate) — ours must match with converted weights."""
    from i2v_adapter_tpu.models.attention import FeedForward

    dim = 8
    proj = torch.nn.Linear(dim, dim * 8)
    out = torch.nn.Linear(dim * 4, dim)
    x = rng.standard_normal((2, 3, dim)).astype(np.float32)
    with torch.no_grad():
        h = proj(torch.from_numpy(x))
        value, gate = h.chunk(2, dim=-1)
        h = value * torch.nn.functional.gelu(gate)
        want = out(h).numpy()
    params = {
        "params": {
            "proj": {
                "kernel": proj.weight.detach().numpy().T,
                "bias": proj.bias.detach().numpy(),
            },
            "proj_out": {
                "kernel": out.weight.detach().numpy().T,
                "bias": out.bias.detach().numpy(),
            },
        }
    }
    got = FeedForward(dim=dim).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_quick_gelu(rng):
    from i2v_adapter_tpu.models.clip import quick_gelu

    x = rng.standard_normal((64,)).astype(np.float32)
    want = (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(np.asarray(quick_gelu(jnp.asarray(x))), want,
                               rtol=1e-5, atol=1e-6)


def test_sinusoidal_positional_embedding_interleaved():
    """Matches diffusers SinusoidalPositionalEmbedding (interleaved sin/cos)."""
    import math

    from i2v_adapter_tpu.models.temporal import sinusoidal_positional_embedding

    dim, n = 8, 5
    pos = torch.arange(n).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, dim, 2).float() * (-math.log(10000.0) / dim))
    want = torch.zeros(n, dim)
    want[:, 0::2] = torch.sin(pos * div)
    want[:, 1::2] = torch.cos(pos * div)
    got = sinusoidal_positional_embedding(n, dim)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


def test_timestep_embedding_vs_diffusers_convention():
    """SD1.5 Timesteps: flip_sin_to_cos=True, downscale_freq_shift=0 —
    emb = [cos | sin] with freqs exp(-ln(1e4) * i / half)."""
    import math

    from i2v_adapter_tpu.models.layers import timestep_embedding

    dim, t = 16, 123.0
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half).float() / half
    freqs = torch.exp(exponent) * t
    want = torch.cat([torch.cos(freqs), torch.sin(freqs)]).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray([t]), dim))[0]
    # f32 trig at argument ~123 rad: ~2e-5 noise; a wrong convention
    # (ordering / freq table) would be O(1) off.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

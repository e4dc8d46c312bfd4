"""Fused-attention kernel family: XLA reference vs naive softmax math,
Pallas (interpret mode on CPU) vs XLA, kv_repeat vs materialized broadcast,
and the custom-VJP backward vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2v_adapter_tpu.ops.attention import (
    dot_product_attention,
    flash_attention,
    xla_attention,
)


def naive_attention(q, k, v, kv_repeat=1):
    bq, nq, h, d = q.shape
    qf = q.astype(np.float64)
    kf = np.repeat(k.astype(np.float64), kv_repeat, axis=0)
    vf = np.repeat(v.astype(np.float64), kv_repeat, axis=0)
    scores = np.einsum("bqhd,bkhd->bhqk", qf, kf) / np.sqrt(d)
    scores -= scores.max(axis=-1, keepdims=True)
    probs = np.exp(scores)
    probs /= probs.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", probs, vf)


@pytest.mark.parametrize("nq,nk,h,d", [(16, 16, 2, 8), (10, 7, 1, 12)])
def test_xla_attention_matches_naive(rng, nq, nk, h, d):
    q = rng.standard_normal((2, nq, h, d)).astype(np.float32)
    k = rng.standard_normal((2, nk, h, d)).astype(np.float32)
    v = rng.standard_normal((2, nk, h, d)).astype(np.float32)
    out = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(out), naive_attention(q, k, v), rtol=1e-4, atol=1e-5
    )


def test_xla_attention_kv_repeat_equals_materialized(rng):
    """kv_repeat=f must equal repeating first-frame K/V f times — the
    semantics of the reference's einops.repeat broadcast
    (/root/reference/src/modules/i2v_adapter.py:484-492)."""
    f = 4
    q = rng.standard_normal((2 * f, 12, 2, 8)).astype(np.float32)
    kv = rng.standard_normal((2, 12, 2, 8)).astype(np.float32)
    out = xla_attention(jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), kv_repeat=f)
    expected = naive_attention(q, kv, kv, kv_repeat=f)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "bq,bkv,nq,nk,h,d",
    [
        (2, 2, 64, 64, 2, 8),     # self-attn, blocks fit exactly
        (4, 1, 40, 24, 1, 12),    # cross-frame (kv_repeat=4) + ragged sizes
        (2, 2, 300, 77, 2, 40),   # text-cross-attn-like with SD head dim
    ],
)
def test_pallas_interpret_matches_xla(rng, bq, bkv, nq, nk, h, d):
    kv_repeat = bq // bkv
    q = rng.standard_normal((bq, nq, h, d)).astype(np.float32)
    k = rng.standard_normal((bkv, nk, h, d)).astype(np.float32)
    v = rng.standard_normal((bkv, nk, h, d)).astype(np.float32)
    ref = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        kv_repeat=kv_repeat)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_repeat=kv_repeat,
        block_q=32, block_kv=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_static_max_matches_exact(rng):
    """Static-offset softmax (exp2(s - C), no per-row max pass) is exact
    within the fp32/bf16 exponent range — typical attention logits sit far
    inside it, and self-attention's q.q diagonal bounds the underflow side."""
    q = rng.standard_normal((4, 96, 2, 8)).astype(np.float32)
    k = rng.standard_normal((2, 64, 2, 8)).astype(np.float32)
    v = rng.standard_normal((2, 64, 2, 8)).astype(np.float32)
    ref = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        kv_repeat=2)
    got = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_repeat=2,
        block_q=32, block_kv=32, interpret=True, static_max=64.0,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_fused_rowsum_matches_default(rng):
    """I2V_FLASH_FUSED_ROWSUM folds the softmax denominator into the p@v
    MXU dot (8-row ones block on v, l read from acc column d) — output and
    logsumexp stats must match the explicit jnp.sum path on both the
    static-offset and running-max softmaxes, across kv-block boundaries.
    (Measured a dead tie on v5e — Mosaic already folds the lane reduction
    into the exp2 pass — so the default stays off; BASELINE.md ledger.)"""
    q = rng.standard_normal((4, 96, 2, 8)).astype(np.float32)
    k = rng.standard_normal((2, 64, 2, 8)).astype(np.float32)
    v = rng.standard_normal((2, 64, 2, 8)).astype(np.float32)
    for static_max in (0.0, 64.0):
        base, lse_base = flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_repeat=2,
            block_q=32, block_kv=32, interpret=True,
            static_max=static_max, with_stats=True, fused_rowsum=False,
        )
        fused, lse_fused = flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_repeat=2,
            block_q=32, block_kv=32, interpret=True,
            static_max=static_max, with_stats=True, fused_rowsum=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(base), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(lse_fused), np.asarray(lse_base), rtol=1e-4, atol=1e-4
        )


def test_custom_vjp_backward_matches_autodiff(rng):
    q = rng.standard_normal((4, 8, 2, 8)).astype(np.float32)
    kv = rng.standard_normal((2, 8, 2, 8)).astype(np.float32)

    def loss_pallas(q, k, v):
        out = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_repeat=2,
            impl="pallas_interpret",
        )
        return jnp.sum(out**2)

    def loss_xla(q, k, v):
        out = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            kv_repeat=2)
        return jnp.sum(out**2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, kv, kv)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, kv, kv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_dispatcher_falls_back_on_cpu(rng):
    q = rng.standard_normal((1, 130, 1, 8)).astype(np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q))
    assert out.shape == q.shape


def test_temporal_attention_vpu_matches_mxu(rng):
    from i2v_adapter_tpu.ops.attention import temporal_attention

    q = jnp.asarray(rng.standard_normal((2, 4, 6, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    a = temporal_attention(q, k, v, heads=2, impl="vpu")
    b = temporal_attention(q, k, v, heads=2, impl="mxu")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_temporal_attention_is_per_token(rng):
    """Attention mixes frames but never spatial positions: changing token
    s=3 must not affect other tokens' outputs."""
    from i2v_adapter_tpu.ops.attention import temporal_attention

    q = jnp.asarray(rng.standard_normal((1, 4, 6, 16)).astype(np.float32))
    out1 = temporal_attention(q, q, q, heads=2)
    q2 = q.at[:, :, 3].add(1.0)
    out2 = temporal_attention(q2, q2, q2, heads=2)
    diff = np.abs(np.asarray(out1 - out2)).sum(axis=(0, 1, 3))
    assert diff[3] > 0
    np.testing.assert_allclose(diff[np.arange(6) != 3], 0, atol=1e-6)


def test_temporal_attention_vpu2_matches_mxu(rng):
    from i2v_adapter_tpu.ops.attention import temporal_attention

    q = jnp.asarray(rng.standard_normal((2, 4, 6, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    a = temporal_attention(q, k, v, heads=2, impl="vpu2")
    b = temporal_attention(q, k, v, heads=2, impl="mxu")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_temporal_attention_pallas_matches_f64(rng):
    """The fused pallas frame-attention kernel against a float64 gold
    reference.  The XLA einsum path ('mxu') runs the d-contraction at
    default matmul precision (~1.5e-2 max err at d=40), so the kernel is
    compared against numpy float64, not against it."""
    import math

    from i2v_adapter_tpu.ops.attention import temporal_attention

    b, f, s, c, h = 2, 4, 6, 16, 2
    d = c // h
    q = rng.standard_normal((b, f, s, c)).astype(np.float32)
    k = rng.standard_normal((b, f, s, c)).astype(np.float32)
    v = rng.standard_normal((b, f, s, c)).astype(np.float32)

    qh = q.astype(np.float64).reshape(b, f, s, h, d)
    kh = k.astype(np.float64).reshape(b, f, s, h, d)
    vh = v.astype(np.float64).reshape(b, f, s, h, d)
    scores = np.einsum("bfshd,bgshd->bshfg", qh, kh) / math.sqrt(d)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    gold = np.einsum("bshfg,bgshd->bfshd", p, vh).reshape(b, f, s, c)

    got = temporal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=h,
        impl="pallas_interpret",
    )
    np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-4, atol=1e-5)


def test_temporal_attention_pallas_backward_matches_mxu(rng):
    """custom_vjp backward of the pallas temporal path == autodiff of the
    einsum reference."""
    from i2v_adapter_tpu.ops.attention import temporal_attention

    q = jnp.asarray(rng.standard_normal((1, 4, 6, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss(impl):
        def f(q, k, v):
            out = temporal_attention(q, k, v, heads=2, impl=impl)
            return jnp.sum(out * out)

        return f

    g_pallas = jax.grad(loss("pallas_interpret"), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss("mxu"), argnums=(0, 1, 2))(q, k, v)
    for a, b2 in zip(g_pallas, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), rtol=1e-3, atol=1e-4
        )


def test_temporal_attention_cs_matches_f64(rng):
    """The channel-major (CS) kernel — S on lanes, heads sliced by the
    grid along sublanes, zero in-kernel transposes — against float64,
    at head dims that exercise non-128 sublane slices (d=8 here; 40/80/160
    in the SD1.5 model all satisfy the same 8-divisibility rule)."""
    import math

    from i2v_adapter_tpu.ops.attention import temporal_attention

    b, f, s, c, h = 2, 4, 6, 16, 2
    d = c // h
    q = rng.standard_normal((b, f, s, c)).astype(np.float32)
    k = rng.standard_normal((b, f, s, c)).astype(np.float32)
    v = rng.standard_normal((b, f, s, c)).astype(np.float32)

    qh = q.astype(np.float64).reshape(b, f, s, h, d)
    kh = k.astype(np.float64).reshape(b, f, s, h, d)
    vh = v.astype(np.float64).reshape(b, f, s, h, d)
    scores = np.einsum("bfshd,bgshd->bshfg", qh, kh) / math.sqrt(d)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    gold = np.einsum("bshfg,bgshd->bfshd", p, vh).reshape(b, f, s, c)

    got = temporal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=h,
        impl="pallas_cs_interpret",
    )
    np.testing.assert_allclose(np.asarray(got), gold, rtol=1e-4, atol=1e-5)


def test_cs_block_s_mosaic_legality():
    """Block selection for the CS kernel must only return Mosaic-legal
    S-blocks (multiple of 128 or the full S axis within VMEM budget), and
    None where no legal block exists — the 768px temporal sites
    (s=576/144 at d=160) have no 128-multiple divisor at all, which
    crashed BASELINE config 5 until the dispatch learned to fall back to
    the einsum path (round 3, session 4)."""
    from i2v_adapter_tpu.ops.attention import _cs_block_s

    # 512px family (powers of two): 128-multiple blocks exist everywhere
    assert _cs_block_s(4096, 40, 16, 2) == 256
    assert _cs_block_s(1024, 80, 16, 2) == 128
    assert _cs_block_s(256, 160, 16, 2) == 128
    # 768px family: 9216/2304 divide by 128; 576/144 have no 128-multiple
    # divisor and a full-S block overruns Mosaic's scoped VMEM at d=160
    # (measured 19.57M > 16M at s=144) -> None, einsum fallback
    assert _cs_block_s(9216, 40, 16, 2) == 256
    assert _cs_block_s(2304, 80, 16, 2) == 128
    assert _cs_block_s(576, 160, 16, 2) is None
    assert _cs_block_s(144, 160, 16, 2) is None
    for s, d in [(9216, 40), (2304, 80)]:
        bs = _cs_block_s(s, d, 16, 2)
        assert bs % 128 == 0 or bs == s
        assert s % bs == 0


def test_temporal_attention_cs_query_slice_matches_full(rng):
    """fq < f (the seq-sharded SPMD slice): CS kernel on a query-frame
    slice == the matching rows of the full-frame result."""
    from i2v_adapter_tpu.ops.attention import _temporal_flash_cs

    q = jnp.asarray(rng.standard_normal((1, 4, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    full = _temporal_flash_cs(q, k, v, heads=2, interpret=True)
    part = _temporal_flash_cs(q[:, 1:3], k, v, heads=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(part), np.asarray(full[:, 1:3]), rtol=1e-5, atol=1e-6
    )


def test_temporal_attention_cs_backward_matches_mxu(rng):
    """custom_vjp backward of the CS path == autodiff of the einsum ref."""
    from i2v_adapter_tpu.ops.attention import temporal_attention

    q = jnp.asarray(rng.standard_normal((1, 4, 6, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss(impl):
        def f(q, k, v):
            out = temporal_attention(q, k, v, heads=2, impl=impl)
            return jnp.sum(out * out)

        return f

    g_cs = jax.grad(loss("pallas_cs_interpret"), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss("mxu"), argnums=(0, 1, 2))(q, k, v)
    for a, b2 in zip(g_cs, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), rtol=1e-3, atol=1e-4
        )


def test_groupnorm_mm_matches_flax(rng):
    """Matmul-stats GroupNorm == nn.GroupNorm (same params/eps)."""
    import flax.linen as nn

    from i2v_adapter_tpu.ops.norms import GroupNormMM

    x = rng.standard_normal((3, 6, 6, 32)).astype(np.float32) * 3 + 1.5
    ref_mod = nn.GroupNorm(num_groups=8, epsilon=1e-6)
    params = ref_mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial affine
    params = {"params": {
        "scale": jnp.asarray(rng.standard_normal(32).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(32).astype(np.float32)),
    }}
    want = ref_mod.apply(params, jnp.asarray(x))
    got = GroupNormMM(num_groups=8, epsilon=1e-6).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # rank-2 and rank-3 inputs too
    x2 = rng.standard_normal((4, 5, 32)).astype(np.float32)
    want2 = ref_mod.apply(params, jnp.asarray(x2))
    got2 = GroupNormMM(num_groups=8, epsilon=1e-6).apply(params, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-5)


def test_layernorm_mm_matches_flax(rng):
    import flax.linen as nn

    from i2v_adapter_tpu.ops.norms import LayerNormMM

    x = rng.standard_normal((3, 5, 32)).astype(np.float32) * 2 - 0.7
    params = {"params": {
        "scale": jnp.asarray(rng.standard_normal(32).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(32).astype(np.float32)),
    }}
    want = nn.LayerNorm(epsilon=1e-5).apply(params, jnp.asarray(x))
    got = LayerNormMM(epsilon=1e-5).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kv_repeat", [1, 4])
def test_flash_pallas_backward_matches_xla(rng, monkeypatch, kv_repeat):
    """Pallas flash backward (blockwise recompute + saved log2 lse) vs the
    autodiff of xla_attention, incl. the cross-frame kv_repeat fan-in
    (VERDICT r2 #6)."""
    from i2v_adapter_tpu.ops.attention import (
        dot_product_attention,
        xla_attention,
    )

    bkv, nk, h, d = 2, 24, 2, 8
    nq = 16
    bq = bkv * kv_repeat
    q = jnp.asarray(rng.standard_normal((bq, nq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bkv, nk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bkv, nk, h, d)).astype(np.float32))

    def loss_fn(attn):
        def f(q, k, v):
            out = attn(q, k, v)
            return jnp.sum(jnp.sin(out))

        return f

    monkeypatch.setenv("I2V_FLASH_BWD", "pallas_interpret")
    g_pallas = jax.grad(
        loss_fn(lambda q, k, v: dot_product_attention(
            q, k, v, kv_repeat=kv_repeat, impl="pallas_interpret",
            static_max=64.0,
        )),
        argnums=(0, 1, 2),
    )(q, k, v)
    monkeypatch.setenv("I2V_FLASH_BWD", "xla")
    g_ref = jax.grad(
        loss_fn(lambda q, k, v: xla_attention(q, k, v, kv_repeat=kv_repeat)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for got, want, name in zip(g_pallas, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name} mismatch",
        )


def test_flash_pallas_backward_blocked_shapes(rng, monkeypatch):
    """Backward across multiple q/kv blocks with padding (non-divisible
    lengths force the mask paths)."""
    from i2v_adapter_tpu.ops.attention import _flash_backward, xla_attention

    bkv, nk, h, d, nq = 1, 40, 2, 8, 24
    q = jnp.asarray(rng.standard_normal((bkv, nq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bkv, nk, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bkv, nk, h, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((bkv, nq, h, d)).astype(np.float32))

    # reference via autodiff
    out, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v), q, k, v)
    want = vjp(g)

    # forward stats via the interpret kernel (small blocks force >1 block
    # per axis and the padding masks)
    from i2v_adapter_tpu.ops.attention import flash_attention

    o, lse = flash_attention(
        q, k, v, block_q=8, block_kv=16, interpret=True, with_stats=True,
        static_max=64.0,
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(out), atol=2e-5)
    got = _flash_backward(
        q, k, v, o, g, lse, kv_repeat=1, scale=1.0 / np.sqrt(d),
        interpret=True, block_q=8, block_kv=16,
    )
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name} mismatch",
        )

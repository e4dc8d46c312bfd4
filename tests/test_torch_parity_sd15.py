"""SD1.5-SHAPED numerical parity vs the torch mirrors (VERDICT r2 #3).

The composite suite runs at tiny widths; width-dependent convention bugs
(head-dim 40/80/160 splits, 77+4 token layout, groups-of-32 GroupNorm at
real channel counts, time-tower widths) are exactly what tiny configs can't
catch.  These tests run the REAL SD1.5 shape — block_out_channels
(320, 640, 1280, 1280), 8 heads, cross_attention_dim 768, 77+4 tokens —
with random fan-in-scaled weights through (a) utils/convert + the Flax
models and (b) the torch mirror of the reference math
(/root/reference/src/models/unet_motion_cross_frame_attn.py:1289-1451).

Spatial extents are kept small (256px-class latents and below) so the
suite stays CPU-tractable; widths and token counts are the real ones.
A full-UNet denoise-eval PSNR (>35 dB acceptance proxy on identical
inputs) closes the file.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from i2v_adapter_tpu.config import VideoUNetConfig  # noqa: E402
from i2v_adapter_tpu.models import VideoUNet  # noqa: E402
from i2v_adapter_tpu.models.attention import SpatialTransformer  # noqa: E402
from i2v_adapter_tpu.models.temporal import TemporalTransformer  # noqa: E402
from i2v_adapter_tpu.tools.parity import psnr  # noqa: E402
from i2v_adapter_tpu.utils import convert  # noqa: E402
from tests import torch_mirror as tm  # noqa: E402
from tests.synth import make_unet_sd  # noqa: E402

# Real SD1.5 widths/heads/tokens; exact math (no fast_gelu/flash) for the
# fp32 comparison.
SD15 = VideoUNetConfig(
    flash_attention=False, fast_gelu=False, flash_static_max=0.0
)
TOL = 1e-4


def _scale_sd(sd):
    """Fan-in scale synth N(0,1) weights: at width 1280 a raw N(0,1) linear
    multiplies activation scale by ~sqrt(fan_in)≈36 per layer, overflowing
    fp32 within a few blocks.  1/sqrt(fan_in) keeps activations O(1) like
    trained weights."""
    out = {}
    for k, v in sd.items():
        if v.ndim >= 2:
            fan_in = int(np.prod(v.shape[1:]))
            out[k] = (v / np.sqrt(fan_in)).astype(np.float32)
        else:
            out[k] = (v * 0.1).astype(np.float32)
    return out


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="module")
def sd15_sds(rng):
    sd, motion, ip = make_unet_sd(rng, SD15)
    sd = _scale_sd(sd)
    motion = _scale_sd(motion)
    ip = {
        "image_proj": _scale_sd(ip["image_proj"]),
        "ip_adapter": _scale_sd(ip["ip_adapter"]),
    }
    # non-zero adapter weights at every attention site (zero-init would
    # hide cross-frame routing bugs)
    adapter = {}
    chans = dict(
        [(f"down_blocks.{i}", c) for i, c in enumerate(SD15.block_out_channels)]
        + [
            (f"up_blocks.{i}", c)
            for i, c in enumerate(reversed(SD15.block_out_channels))
        ]
        + [("mid_block", SD15.block_out_channels[-1])]
    )
    sites = []
    for i, has in enumerate(SD15.down_block_has_attention):
        if has:
            for j in range(SD15.layers_per_block):
                sites.append(f"down_blocks.{i}.attentions.{j}")
    for i, has in enumerate(SD15.up_block_has_attention):
        if has:
            for j in range(SD15.layers_per_block + 1):
                sites.append(f"up_blocks.{i}.attentions.{j}")
    sites.append("mid_block.attentions.0")
    for s in sites:
        ch = chans[s.rsplit(".attentions", 1)[0]]
        p = f"{s}.transformer_blocks.0.i2v_adapter"
        scl = 1.0 / np.sqrt(ch)
        for n in ("to_q", "to_k", "to_v"):
            adapter[f"{p}.{n}.weight"] = (
                rng.standard_normal((ch, ch)) * scl
            ).astype(np.float32)
        adapter[f"{p}.to_out.0.weight"] = (
            rng.standard_normal((ch, ch)) * scl
        ).astype(np.float32)
        adapter[f"{p}.to_out.0.bias"] = (
            rng.standard_normal((ch,)) * 0.1
        ).astype(np.float32)
    return sd, motion, ip, adapter


@pytest.fixture(scope="module")
def converted(sd15_sds):
    sd, motion, ip, adapter = sd15_sds
    return convert.convert_unet(sd, SD15, motion, adapter, ip)


def _maxerr(a, b):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(float(np.max(np.abs(b))), 1.0)
    return float(np.max(np.abs(a - b))) / scale


def test_sd15_down_block_spatial_transformer(rng, sd15_sds, converted):
    """First down-block transformer at real width: C=320, 8 heads of d=40,
    77+4-token context, cross-frame routing on."""
    sd, _, ip, adapter = sd15_sds
    b, f, ch, hgt = 1, 2, 320, 16
    x = rng.standard_normal((b * f, ch, hgt, hgt)).astype(np.float32) * 0.5
    ctx = rng.standard_normal((b * f, 77 + 4, 768)).astype(np.float32) * 0.5
    site = "down_blocks.0.attentions.0"
    ip_kv = (ip["ip_adapter"]["1.to_k_ip.weight"],
             ip["ip_adapter"]["1.to_v_ip.weight"])
    with torch.no_grad():
        want = tm.spatial_transformer(
            sd, site, torch.from_numpy(x), torch.from_numpy(ctx), 8,
            groups=32, adapter_sd=adapter, num_frames=f, cross_frame=True,
            ip_kv=ip_kv, ip_num_tokens=4, ip_scale=1.0,
        ).numpy()
    params = converted["down_blocks_0"]["attentions_0"]
    got = SpatialTransformer(
        heads=8, dim_head=40, use_i2v_adapter=True, ip_num_tokens=4,
        ip_scale=1.0, groups=32, attn_impl="xla",
    ).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx), enable_cross_frame_attn=True, num_frames=f,
    )
    err = _maxerr(np.asarray(got).transpose(0, 3, 1, 2), want)
    assert err < TOL, f"sd15 down-block spatial err {err}"


def test_sd15_mid_block_spatial_transformer(rng, sd15_sds, converted):
    """Mid-block transformer at C=1280 (head dim 160)."""
    sd, _, ip, adapter = sd15_sds
    b, f, ch, hgt = 1, 2, 1280, 4
    x = rng.standard_normal((b * f, ch, hgt, hgt)).astype(np.float32) * 0.5
    ctx = rng.standard_normal((b * f, 77 + 4, 768)).astype(np.float32) * 0.5
    site = "mid_block.attentions.0"
    ip_kv = (ip["ip_adapter"]["31.to_k_ip.weight"],
             ip["ip_adapter"]["31.to_v_ip.weight"])
    with torch.no_grad():
        want = tm.spatial_transformer(
            sd, site, torch.from_numpy(x), torch.from_numpy(ctx), 8,
            groups=32, adapter_sd=adapter, num_frames=f, cross_frame=True,
            ip_kv=ip_kv, ip_num_tokens=4, ip_scale=1.0,
        ).numpy()
    params = converted["mid_block"]["attentions_0"]
    got = SpatialTransformer(
        heads=8, dim_head=160, use_i2v_adapter=True, ip_num_tokens=4,
        ip_scale=1.0, groups=32, attn_impl="xla",
    ).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx), enable_cross_frame_attn=True, num_frames=f,
    )
    err = _maxerr(np.asarray(got).transpose(0, 3, 1, 2), want)
    assert err < TOL, f"sd15 mid-block spatial err {err}"


def test_sd15_up_block_motion_module(rng, sd15_sds, converted):
    """Up-block motion module at C=640 (motion head dim 80), interleaved
    sinusoidal positional embeddings at real width."""
    _, motion, _, _ = sd15_sds
    b, f, ch, hgt = 1, 4, 640, 8
    x = rng.standard_normal((b * f, ch, hgt, hgt)).astype(np.float32) * 0.5
    site = "up_blocks.2.motion_modules.0.temporal_transformer"
    with torch.no_grad():
        want = tm.temporal_transformer(
            motion, site, torch.from_numpy(x), f, 8, groups=32,
        ).numpy()
    params = converted["up_blocks_2"]["motion_modules_0"]
    got = TemporalTransformer(
        heads=8, dim_head=80, max_seq_length=32, groups=32, attn_impl="xla",
    ).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), num_frames=f
    )
    err = _maxerr(np.asarray(got).transpose(0, 3, 1, 2), want)
    assert err < TOL, f"sd15 up-block motion err {err}"


def test_sd15_full_unet_parity_and_psnr(rng, sd15_sds, converted):
    """One full SD1.5-width denoise evaluation (256px-class 32x32 latents,
    2 frames, CFG-free) vs the torch mirror: max-err < 1e-4 AND the >35 dB
    PSNR acceptance computed on identical inputs.  Covers the whole real-
    width chain: time tower, IP token concat, 4-depth down/mid/up, skip
    concats, GroupNorm head."""
    sd, motion, ip, adapter = sd15_sds
    b, f, lat = 1, 2, 32
    sample = rng.standard_normal((b, f, 4, lat, lat)).astype(np.float32)
    text = rng.standard_normal((b, 77, 768)).astype(np.float32) * 0.5
    img = rng.standard_normal((b, SD15.image_embed_dim)).astype(np.float32)
    t = 421.0
    with torch.no_grad():
        want = tm.video_unet(
            SD15, sd, motion, ip, torch.from_numpy(sample), t,
            torch.from_numpy(text), torch.from_numpy(img), cross_frame=True,
            adapter_sd=adapter,
        ).numpy()
    unet = VideoUNet(SD15)
    got = unet.apply(
        {"params": converted},
        jnp.asarray(sample.transpose(0, 1, 3, 4, 2)),
        jnp.full((b,), t),
        jnp.asarray(text), jnp.asarray(img),
        enable_cross_frame_attn=True,
    )
    got = np.asarray(got).transpose(0, 1, 4, 2, 3)
    assert got.shape == want.shape
    err = _maxerr(got, want)
    assert err < TOL, f"sd15 full-UNet max err {err}"
    peak = float(np.max(np.abs(want))) or 1.0
    db = psnr(got, want, peak=peak)
    assert db > 35.0, f"sd15 full-UNet PSNR {db:.1f} dB"


# ---------------------------------------------------------------------------
# full pipeline-loop parity at SD1.5 widths: exact, serving-default, turbo
# ---------------------------------------------------------------------------

_LOOP = dict(b=1, f=2, lat=32, steps=2, guidance=7.5)


def _jax_pipeline_loop(
    unet_cfg, vae_cfg, converted_params, vae_params, inputs,
    encoder_cache: int = 1,
    cfg_cutoff: float = 1.0,
):
    """Run the product denoise loop (first-frame clamp -> CFG -> UNet ->
    guidance -> DDIM -> final clamp -> VAE decode) via the same
    ``_build_parts`` functions the shipping sampler scans over.

    ``encoder_cache=2`` drives the turbo full/cached step pairs instead
    (odd trailing step full), mirroring the fused turbo scan's schedule.
    ``cfg_cutoff < 1.0`` runs the trailing steps via the cond-only part,
    mirroring the fused split scan (adaptive guidance)."""
    from i2v_adapter_tpu.config import I2VModelConfig, PipelineConfig
    from i2v_adapter_tpu.models import AutoencoderKL
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline
    from i2v_adapter_tpu.schedulers import make_schedule

    b, f, lat = _LOOP["b"], _LOOP["f"], _LOOP["lat"]
    steps, guidance = _LOOP["steps"], _LOOP["guidance"]
    height = width = lat * vae_cfg.spatial_scale_factor
    model_cfg = I2VModelConfig(unet=unet_cfg, vae=vae_cfg)

    pipe = I2VAdapterPipeline.__new__(I2VAdapterPipeline)
    pipe.config = model_cfg
    pipe.pipe_config = PipelineConfig(
        num_frames=f, height=height, width=width, num_inference_steps=steps,
        dtype="float32",
    )
    pipe.dtype = jnp.float32
    pipe.unet = VideoUNet(unet_cfg)
    pipe.vae = AutoencoderKL(vae_cfg)
    pipe.schedule = make_schedule(model_cfg.scheduler)
    params = {
        "unet": {"params": converted_params},
        "vae": {"params": vae_params},
    }
    prep_fn, step_fn, decode_fn, ts, prev, pair_fns = pipe._build_parts(
        b, f, height, width, steps, 1.0, guidance, True, True, 0, False, 1
    )
    consts = (
        jnp.asarray(inputs["cond_latents"]),
        jnp.asarray(inputs["text_states"]),
        jnp.asarray(inputs["image_embeds"]),
    )
    carry = (jnp.asarray(inputs["latents0"]), jax.random.PRNGKey(0))
    if encoder_cache > 1:
        step_full_fn, step_cached_fn = pair_fns[0], pair_fns[1]
        n2 = (len(ts) // 2) * 2
        for i in range(0, n2, 2):
            carry, enc = step_full_fn(
                params, consts, carry, jnp.asarray(ts[i]), jnp.asarray(prev[i])
            )
            carry = step_cached_fn(
                params, consts, carry, jnp.asarray(ts[i + 1]),
                jnp.asarray(prev[i + 1]), enc,
            )
        for i in range(n2, len(ts)):
            carry = step_fn(
                params, consts, carry, jnp.asarray(ts[i]), jnp.asarray(prev[i])
            )
    else:
        n_cfg = (
            len(ts) if cfg_cutoff >= 1.0
            else int(round(cfg_cutoff * len(ts)))
        )
        step_cond_fn = pair_fns[2]
        for i, (t, tp) in enumerate(zip(ts, prev)):
            fn_i = step_fn if i < n_cfg else step_cond_fn
            carry = fn_i(
                params, consts, carry, jnp.asarray(t), jnp.asarray(tp)
            )
    got = np.asarray(decode_fn(params, consts, carry[0]))  # (B, F, H, W*3)
    return got.reshape(b, f, height, width, 3)


@pytest.fixture(scope="module")
def loop_setup(rng, sd15_sds):
    """Shared injected state + the torch/float64 reference for every
    pipeline-loop test (the SD1.5-width torch mirror is the expensive part
    — computed once per module)."""
    from i2v_adapter_tpu.config import I2VModelConfig, tiny_test_config
    from i2v_adapter_tpu.schedulers import make_schedule
    from i2v_adapter_tpu.schedulers.ddim import ddim_schedule_arrays
    from tests.synth import make_vae_sd

    sd, motion, ip, adapter = sd15_sds
    tiny_vae = tiny_test_config().vae
    b, f, lat = _LOOP["b"], _LOOP["f"], _LOOP["lat"]
    steps, guidance = _LOOP["steps"], _LOOP["guidance"]
    height = width = lat * tiny_vae.spatial_scale_factor
    scale = tiny_vae.scaling_factor
    model_cfg = I2VModelConfig(unet=SD15, vae=tiny_vae)
    schedule = make_schedule(model_cfg.scheduler)
    ts, prev = ddim_schedule_arrays(model_cfg.scheduler, steps, 1.0)

    vae_sd = make_vae_sd(rng, tiny_vae)
    inputs = {
        "latents0": rng.standard_normal((b, f, lat, lat, 4)).astype(np.float32),
        "cond_latents": rng.standard_normal((b, lat, lat, 4)).astype(np.float32),
        "text_states": (
            rng.standard_normal((2 * b, 77, 768)).astype(np.float32) * 0.5
        ),
        "image_embeds": rng.standard_normal(
            (2 * b, SD15.image_embed_dim)
        ).astype(np.float32),
    }

    # --- independent torch/float64 mirror of the reference loop ---
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    final_acp = float(np.asarray(schedule.final_alpha_cumprod))
    x = inputs["latents0"].transpose(0, 1, 4, 2, 3).astype(np.float64)
    cond_t = inputs["cond_latents"].transpose(0, 3, 1, 2).astype(np.float64)
    with torch.no_grad():
        for t, tp in zip(ts, prev):
            x[:, 0] = cond_t
            model_in = np.concatenate([x, x], axis=0).astype(np.float32)
            eps = tm.video_unet(
                SD15, sd, motion, ip, torch.from_numpy(model_in), float(t),
                torch.from_numpy(inputs["text_states"]),
                torch.from_numpy(inputs["image_embeds"]), cross_frame=True,
                adapter_sd=adapter,
            ).numpy().astype(np.float64)
            uncond, text = np.split(eps, 2, axis=0)
            eps = uncond + guidance * (text - uncond)
            a_t = acp[t]
            a_prev = acp[tp] if tp >= 0 else final_acp
            x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
            x = np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps
        x[:, 0] = cond_t
        z = (x.reshape(b * f, 4, lat, lat) / scale).astype(np.float32)
        want = tm.vae_decoder(tiny_vae, vae_sd, torch.from_numpy(z)).numpy()
    want = want.reshape(b, f, 3, height, width).transpose(0, 1, 3, 4, 2)
    return {
        "tiny_vae": tiny_vae,
        "vae_params": convert.convert_vae(vae_sd, tiny_vae),
        "inputs": inputs,
        "want": want,
    }


@pytest.fixture(scope="module")
def exact_loop_output(loop_setup, converted):
    """The exact-config jax loop output, shared by the exact-parity test
    and the turbo/serving deviation measurements."""
    return _jax_pipeline_loop(
        SD15, loop_setup["tiny_vae"], converted, loop_setup["vae_params"],
        loop_setup["inputs"],
    )


def test_sd15_pipeline_loop_psnr(loop_setup, exact_loop_output):
    """FULL-PIPELINE parity at SD1.5 widths (VERDICT r2 #3, pipeline half):
    the product denoise loop — first-frame clamp -> CFG doubling -> UNet ->
    guidance combine -> DDIM update, iterated, then final clamp + VAE decode
    (reference hot loop, pipeline_i2v_adapter.py:665-700) — vs an
    INDEPENDENT torch/float64 transcription of the same reference math.

    The UNet runs at the real 256px-class latent grid (32x32, widths
    320/640/1280, CFG batch 2); the VAE is the tiny-width config so the
    decode stays CPU-tractable (decode-path width parity is covered by
    test_vae_encoder_decoder_parity).  Identical injected noise/consts on
    both sides; acceptance is the >35 dB PSNR bar plus a composition
    max-err bound."""
    got, want = exact_loop_output, loop_setup["want"]
    err = _maxerr(got, want)
    assert err < 1e-3, f"sd15 pipeline-loop max err {err}"
    peak = float(np.max(np.abs(want))) or 1.0
    db = psnr(got.astype(np.float64), want.astype(np.float64), peak=peak)
    assert db > 35.0, f"sd15 pipeline PSNR {db:.1f} dB"


def test_sd15_pipeline_loop_psnr_serving_default(
    loop_setup, converted, monkeypatch
):
    """THE SHIPPING CONFIG at SD1.5 width (VERDICT r3 #2): every serving
    default at once — int8 UNet convs + int8 VAE-decoder convs + tanh
    fast_gelu + static-offset flash softmax + Pallas flash / pallas_cs
    temporal kernels (interpret mode on CPU, same dispatch thresholds and
    Mosaic-legality gates as the TPU auto path via the _on_tpu patch) —
    run through the full pipeline loop vs the torch/float64 mirror of the
    reference math.  >35 dB is the north-star acceptance bar
    (pipeline_i2v_adapter.py:539-719); previously the int8/kernel gates ran
    only at tiny widths."""
    from i2v_adapter_tpu.ops import attention as A

    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    orig_flash = A._attention_pallas
    monkeypatch.setattr(
        A, "_attention_pallas",
        lambda q, k, v, rep, scale, interp, sm: orig_flash(
            q, k, v, rep, scale, True, sm
        ),
    )
    orig_cs = A._temporal_pallas_cs
    monkeypatch.setattr(
        A, "_temporal_pallas_cs",
        lambda q, k, v, h, interp: orig_cs(q, k, v, h, True),
    )
    orig_tp = A._temporal_pallas
    monkeypatch.setattr(
        A, "_temporal_pallas",
        lambda q, k, v, h, interp: orig_tp(q, k, v, h, True),
    )

    serving_unet = SD15.replace(
        flash_attention=True, fast_gelu=True, flash_static_max=64.0,
        int8_conv=True,
    )
    serving_vae = loop_setup["tiny_vae"].replace(int8_decode=True)
    got = _jax_pipeline_loop(
        serving_unet, serving_vae, converted, loop_setup["vae_params"],
        loop_setup["inputs"],
    )
    want = loop_setup["want"]
    peak = float(np.max(np.abs(want))) or 1.0
    db = psnr(got.astype(np.float64), want.astype(np.float64), peak=peak)
    assert db > 35.0, f"sd15 serving-default pipeline PSNR {db:.1f} dB"


def test_sd15_pipeline_loop_turbo_deviation(
    loop_setup, converted, exact_loop_output
):
    """Quantify the encoder-cache turbo trade at SD1.5 width (VERDICT r3
    #3): ``encoder_cache=2`` (every second step reuses the previous step's
    down-path features) vs the exact loop.  The turbo row in PARITY.md
    carries the measured bound.  This is a CONTENT-level approximation —
    the bar here is not the 35 dB rounding bar but a sanity floor (>20 dB
    at the 2-step schedule's worst-case 500-timestep staleness; the
    shipping 25-step schedule's gap is ~40 timesteps, so real deviation is
    strictly smaller) plus structural checks."""
    got = _jax_pipeline_loop(
        SD15, loop_setup["tiny_vae"], converted, loop_setup["vae_params"],
        loop_setup["inputs"], encoder_cache=2,
    )
    exact = exact_loop_output
    assert np.isfinite(got).all()
    assert got.shape == exact.shape
    # must actually differ (the cached step is an approximation)...
    dev = float(np.max(np.abs(got - exact)))
    assert dev > 0.0
    peak = float(np.max(np.abs(exact))) or 1.0
    db = psnr(got.astype(np.float64), exact.astype(np.float64), peak=peak)
    # ...but stay image-level close even at worst-case staleness
    assert db > 20.0, f"sd15 turbo deviation PSNR {db:.1f} dB"
    print(f"sd15 turbo vs exact: {db:.1f} dB (2-step worst-case staleness)")


def test_sd15_pipeline_loop_cfg_cutoff_deviation(
    loop_setup, converted, exact_loop_output
):
    """Quantify the adaptive-guidance trade at SD1.5 width: ``cfg_cutoff=
    0.5`` on the 2-step loop = the LAST step runs cond-only (guidance
    off).  Worst case by construction: the shipping 22-step schedule cuts
    only late steps where the branches have converged, while this
    2-step harness drops guidance at timestep ~500.  Same content-level
    bar as the turbo test (>20 dB sanity floor + structural checks)."""
    got = _jax_pipeline_loop(
        SD15, loop_setup["tiny_vae"], converted, loop_setup["vae_params"],
        loop_setup["inputs"], cfg_cutoff=0.5,
    )
    exact = exact_loop_output
    assert np.isfinite(got).all()
    assert got.shape == exact.shape
    dev = float(np.max(np.abs(got - exact)))
    assert dev > 0.0  # guidance genuinely dropped for the cut step
    peak = float(np.max(np.abs(exact))) or 1.0
    db = psnr(got.astype(np.float64), exact.astype(np.float64), peak=peak)
    assert db > 20.0, f"sd15 cfg_cutoff deviation PSNR {db:.1f} dB"
    print(f"sd15 cfg_cutoff=0.5 vs exact: {db:.1f} dB "
          f"(2-step worst case: guidance off from t~500)")

"""LoRA merging, textual inversion, FreeU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from i2v_adapter_tpu.config import tiny_test_config
from i2v_adapter_tpu.models import CLIPTextEncoder, VideoUNet
from i2v_adapter_tpu.utils.lora import (
    load_textual_inversion,
    merge_lora,
    parse_lora_state_dict,
)
from i2v_adapter_tpu.utils.tokenizer import make_test_tokenizer

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def unet_params():
    unet = VideoUNet(CFG.unet)
    return unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 8, 8, 4)), jnp.zeros(()),
        jnp.zeros((1, 6, CFG.unet.cross_attention_dim)),
        jnp.zeros((1, CFG.unet.image_embed_dim)),
        enable_cross_frame_attn=True,
    )["params"]


def test_lora_merge_peft_layout(unet_params, rng):
    ch = CFG.unet.block_out_channels[0]
    rank = 4
    down = rng.standard_normal((rank, ch)).astype(np.float32)
    up = rng.standard_normal((ch, rank)).astype(np.float32)
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
        ".lora_A.weight": down,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
        ".lora_B.weight": up,
    }
    merged, patched = merge_lora(unet_params, sd, scale=0.5)
    assert patched == 1
    key = "down_blocks_0/attentions_0/transformer_blocks_0/attn1/to_q/kernel"
    base = flatten_dict(unet_params, sep="/")[key]
    got = flatten_dict(merged, sep="/")[key]
    expected = np.asarray(base) + 0.5 * (up @ down).T * (rank / rank)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_lora_kohya_layout_with_alpha(unet_params, rng):
    ch = CFG.unet.block_out_channels[0]
    rank = 2
    base = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
    sd = {
        f"{base}.lora_down.weight": rng.standard_normal((rank, ch)).astype(np.float32),
        f"{base}.lora_up.weight": rng.standard_normal((ch, rank)).astype(np.float32),
        f"{base}.alpha": np.asarray(1.0, np.float32),
    }
    merged, patched = merge_lora(unet_params, sd)
    assert patched == 1


def test_lora_no_match_raises(unet_params, rng):
    sd = {"unet.bogus.lora_A.weight": rng.standard_normal((2, 4)).astype(np.float32),
          "unet.bogus.lora_B.weight": rng.standard_normal((4, 2)).astype(np.float32)}
    with pytest.raises(ValueError):
        merge_lora(unet_params, sd)


def test_parse_skips_text_encoder_keys(rng):
    sd = {
        "text_encoder.x.lora_A.weight": np.zeros((2, 2), np.float32),
        "lora_te_x.lora_down.weight": np.zeros((2, 2), np.float32),
    }
    assert parse_lora_state_dict(sd) == {}


def test_textual_inversion(tmp_path, rng):
    tok = make_test_tokenizer(str(tmp_path))
    enc = CLIPTextEncoder(CFG.text_encoder)
    # table must match tokenizer vocab for this test
    cfg = CFG.text_encoder.replace(vocab_size=len(tok.encoder))
    enc = CLIPTextEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    emb = rng.standard_normal((2, cfg.hidden_size)).astype(np.float32)
    new_params = load_textual_inversion(params, tok, emb, "<sks>")
    ids = tok.encode("a <sks> dog")
    table = new_params["token_embedding"]["embedding"]
    assert table.shape[0] == len(tok.encoder)
    assert tok.encoder["<sks>"] in ids
    np.testing.assert_allclose(table[tok.encoder["<sks>"]], emb[0])
    # the model runs with new ids after rebuilding for the grown vocab
    enc2 = CLIPTextEncoder(cfg.replace(vocab_size=table.shape[0]))
    out = enc2.apply({"params": new_params}, jnp.asarray([ids[:8]]))
    assert np.isfinite(np.asarray(out)).all()


def test_freeu_changes_output_only_when_enabled(rng):
    base = VideoUNet(CFG.unet)
    sample = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 4)).astype(np.float32))
    text = jnp.asarray(
        rng.standard_normal((1, 6, CFG.unet.cross_attention_dim)).astype(np.float32)
    )
    img = jnp.asarray(
        rng.standard_normal((1, CFG.unet.image_embed_dim)).astype(np.float32)
    )
    params = base.init(jax.random.PRNGKey(0), sample, jnp.zeros(()), text, img)
    out1 = base.apply(params, sample, jnp.zeros(()), text, img)
    freeu = VideoUNet(CFG.unet.replace(freeu=(0.9, 0.2, 1.2, 1.4)))
    out2 = freeu.apply(params, sample, jnp.zeros(()), text, img)
    assert out1.shape == out2.shape
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_fourier_filter_identity_at_scale_one(rng):
    from i2v_adapter_tpu.ops.freeu import fourier_filter

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    out = fourier_filter(x, threshold=1, scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

"""Offline caption -> CLIP text-embedding encoder (reference
tools/encode_text.py): one prompt per line in, one ``text_embeds.npy`` out.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def encode_text(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--caption_file", required=True)
    p.add_argument("--text_encoder_path", required=True)
    p.add_argument("--tokenizer_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args(argv)

    from i2v_adapter_tpu.config import CLIPTextConfig
    from i2v_adapter_tpu.models.clip import CLIPTextEncoder
    from i2v_adapter_tpu.utils import convert
    from i2v_adapter_tpu.utils.tokenizer import CLIPTokenizer

    logging.basicConfig(level=logging.INFO)
    cfg = CLIPTextConfig()
    enc = CLIPTextEncoder(cfg)
    weights = glob.glob(os.path.join(args.text_encoder_path, "*.safetensors"))
    weights += glob.glob(os.path.join(args.text_encoder_path, "*.bin"))
    params = {
        "params": convert.convert_clip_text(
            convert.load_state_dict(weights[0]), cfg
        )
    }
    tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer_path)

    @jax.jit
    def embed(ids):
        return enc.apply(params, ids)

    with open(args.caption_file) as f:
        prompts = [line.rstrip("\n") for line in f]
    out = []
    for i in range(0, len(prompts), args.batch_size):
        ids = tokenizer(prompts[i : i + args.batch_size], padding="max_length")
        out.append(np.asarray(embed(jnp.asarray(ids))))
    np.save(args.output_path, np.concatenate(out).astype(np.float16))
    logger.info("encoded %d prompts -> %s", len(prompts), args.output_path)


if __name__ == "__main__":
    encode_text()

"""Driver hooks: entry() compiles; dryrun_multichip runs on the 8-device
CPU mesh; sharded VAE decode matches single-device decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_shapes():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 2, 32, 32, 4)


def test_decode_sharded_matches_local(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from i2v_adapter_tpu.config import MeshConfig, tiny_test_config
    from i2v_adapter_tpu.models.vae import AutoencoderKL, decode_sharded
    from i2v_adapter_tpu.parallel.mesh import create_mesh

    cfg = tiny_test_config().vae
    vae = AutoencoderKL(cfg)
    z = jnp.asarray(rng.standard_normal((8, 8, 8, cfg.latent_channels))
                    .astype(np.float32))
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    local = vae.apply(params, z, method=vae.decode)
    mesh = create_mesh(MeshConfig())
    sharded = decode_sharded(
        lambda p, zz: vae.apply(p, zz, method=vae.decode), params, z, mesh
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(local), rtol=2e-5, atol=2e-5
    )

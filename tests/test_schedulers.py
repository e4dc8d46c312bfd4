"""Scheduler math tests: closed-form numpy cross-checks and the reference's
first-frame invariant (/root/reference/test/test_first_frame_pertubation.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from i2v_adapter_tpu.config import SchedulerConfig
from i2v_adapter_tpu.schedulers import (
    add_noise,
    compute_snr,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    get_velocity,
    make_schedule,
    truncate_timesteps,
)
from i2v_adapter_tpu.schedulers.ddim import ddim_schedule_arrays


@pytest.fixture(scope="module")
def sched():
    return make_schedule(SchedulerConfig())


def _np_alphas_cumprod():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def test_alphas_cumprod_matches_closed_form(sched):
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), _np_alphas_cumprod(), rtol=1e-5
    )


def test_add_noise_closed_form(sched, rng):
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([10, 500])
    out = add_noise(sched, jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t))
    abar = _np_alphas_cumprod()[t][:, None, None, None]
    expected = np.sqrt(abar) * x + np.sqrt(1 - abar) * eps
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=1e-5)


def test_first_frame_scaled_not_noised(sched, rng):
    """noise[:, 0] = 0 ==> first frame becomes exactly sqrt(abar_t) * x0."""
    x = rng.standard_normal((2, 5, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal(x.shape).astype(np.float32)
    eps[:, 0] = 0
    t = np.array([3, 700])
    out = np.asarray(add_noise(sched, jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t)))
    abar = _np_alphas_cumprod()[t].astype(np.float32)
    for b in range(2):
        np.testing.assert_allclose(
            out[b, 0], np.sqrt(abar[b]) * x[b, 0], rtol=2e-4, atol=1e-6
        )


def test_velocity_identity(sched, rng):
    """sqrt(abar)*v + sqrt(1-abar)*x_t reconstructs eps (standard identity)."""
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal(x.shape).astype(np.float32)
    t = np.array([123])
    v = np.asarray(get_velocity(sched, jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t)))
    xt = np.asarray(add_noise(sched, jnp.asarray(x), jnp.asarray(eps), jnp.asarray(t)))
    abar = _np_alphas_cumprod()[t[0]]
    recon_eps = np.sqrt(abar) * v + np.sqrt(1 - abar) * xt
    np.testing.assert_allclose(recon_eps, eps, rtol=1e-3, atol=1e-4)


def test_snr(sched):
    t = jnp.array([0, 999])
    snr = np.asarray(compute_snr(sched, t))
    abar = _np_alphas_cumprod()[[0, 999]]
    np.testing.assert_allclose(snr, abar / (1 - abar), rtol=1e-4)


def test_ddim_timesteps_linspace():
    ts = ddim_timesteps(SchedulerConfig(), 25)
    expected = np.linspace(0, 999, 25).round()[::-1].astype(np.int64)
    np.testing.assert_array_equal(ts, expected)
    assert ts[0] == 999 and ts[-1] == 0


def test_truncation_strength():
    """strength=0.9 with 25 steps keeps the trailing 22 timesteps
    (reference get_timesteps, pipeline_i2v_adapter.py:529-536)."""
    cfg = SchedulerConfig()
    ts = ddim_timesteps(cfg, 25)
    tr = truncate_timesteps(ts, 25, 0.9)
    assert len(tr) == 22
    np.testing.assert_array_equal(tr, ts[3:])


def test_ddim_step_exact_denoise(sched, rng):
    """If model_output is the exact eps used in add_noise, a DDIM step lands
    on add_noise(x0, eps, t_prev) exactly (deterministic eta=0 path)."""
    x0 = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    eps = rng.standard_normal(x0.shape).astype(np.float32)
    ts, prev = ddim_schedule_arrays(SchedulerConfig(), 25)
    t, tp = int(ts[5]), int(prev[5])
    xt = add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([t]))
    x_prev = ddim_step(
        sched, jnp.asarray(eps), jnp.asarray([t]), jnp.asarray([tp]), xt
    )
    expected = add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([tp]))
    np.testing.assert_allclose(
        np.asarray(x_prev), np.asarray(expected), rtol=1e-3, atol=1e-4
    )


def test_ddim_final_step_returns_x0(sched, rng):
    """Stepping from t=0 hits final_alpha_cumprod = alphas_cumprod[0]
    (set_alpha_to_one=False, the SD1.5 convention)."""
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal(x0.shape).astype(np.float32)
    xt = add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([0]))
    out = ddim_step(sched, jnp.asarray(eps), jnp.asarray([0]), jnp.asarray([-40]), xt)
    # prev alpha == alphas_cumprod[0]: result == add_noise(x0, eps, 0) == xt
    np.testing.assert_allclose(np.asarray(out), np.asarray(xt), rtol=1e-4, atol=1e-5)


def test_ddpm_step_t0_returns_mean(sched, rng):
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal(x0.shape).astype(np.float32)
    xt = add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([0]))
    out = ddpm_step(
        sched, jnp.asarray(eps), jnp.asarray([0]), xt, noise=jnp.asarray(eps)
    )
    # at t=0, alpha_prod_prev=1 -> mean = x0 exactly, no noise added
    np.testing.assert_allclose(np.asarray(out), x0, rtol=1e-3, atol=1e-4)


def test_ddpm_step_posterior_mean_closed_form(sched, rng):
    """One ancestral step equals the DDPM posterior mean (eq. 7) computed in
    numpy float64."""
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal(x0.shape).astype(np.float32)
    t = 431
    xt = np.asarray(add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([t])))
    out = np.asarray(ddpm_step(sched, jnp.asarray(eps), jnp.asarray([t]), jnp.asarray(xt)))

    abar = _np_alphas_cumprod()
    a_t, a_prev = abar[t], abar[t - 1]
    cur_beta = 1 - a_t / a_prev
    x0_hat = (xt - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    mean = (
        np.sqrt(a_prev) * cur_beta / (1 - a_t) * x0_hat
        + np.sqrt(a_t / a_prev) * (1 - a_prev) / (1 - a_t) * xt
    )
    np.testing.assert_allclose(out, mean, rtol=1e-3, atol=1e-4)

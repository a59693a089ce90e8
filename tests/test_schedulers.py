"""Scheduler correctness via analytic invariants (no diffusers available).

Strongest check: the "perfect denoiser" invariant — if the model always
returns the true noise for the current sample, every schedule must recover
x0 exactly (to fp error) at sigma=0, regardless of step count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omg_tpu.diffusion import sampling, schedulers


def test_leading_timesteps_match_sdxl_defaults():
    s = schedulers.make_schedule("euler", 50)
    ts = np.asarray(s.timesteps)
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    # sigma at t=981 for SDXL scaled_linear betas: sqrt((1-abar)/abar)
    betas = schedulers.betas_scaled_linear()
    abar = np.cumprod(1 - betas)[981]
    np.testing.assert_allclose(float(s.sigmas[0]),
                               ((1 - abar) / abar) ** 0.5, rtol=1e-4)
    assert float(s.sigmas[-1]) == 0.0
    # leading spacing => init_noise_sigma = sqrt(sigma_max^2+1)
    np.testing.assert_allclose(float(s.init_noise_sigma),
                               (float(s.sigmas[0]) ** 2 + 1) ** 0.5, rtol=1e-6)


def test_sigmas_monotone_decreasing():
    for kind in ("euler", "ddim", "dpmpp_2m"):
        s = schedulers.make_schedule(kind, 30)
        assert np.all(np.diff(np.asarray(s.sigmas)) < 1e-12)


@pytest.mark.parametrize("kind", ["euler", "dpmpp_2m"])
@pytest.mark.parametrize("steps", [5, 50])
def test_perfect_denoiser_recovers_x0_sigma_space(kind, steps):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (2, 4, 4, 3))
    noise = jax.random.normal(k2, x0.shape)
    sched = schedulers.make_schedule(kind, steps)
    # Go through the real entry path: scale_initial_noise puts unit noise
    # into each schedule's sample space (euler AND dpmpp_2m are sigma-space,
    # so both expand by sqrt(sigma_max^2+1) under leading spacing).
    x = x0 + schedulers.scale_initial_noise(sched, noise)

    def model_fn(x_in, t, i):
        # invert scale_model_input to get back the raw sample, then the
        # true eps for that sample: eps = (x - x0)/sigma. Both sigma-space
        # schedules scale the model input by 1/sqrt(sigma^2+1).
        sigma = sched.sigmas[i]
        x_raw = x_in * jnp.sqrt(sigma**2 + 1)
        return (x_raw - x0) / jnp.maximum(sigma, 1e-8)

    out = sampling.denoise_loop(sched, model_fn, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


@pytest.mark.parametrize("kind", ["euler", "dpmpp_2m"])
def test_sigma_space_model_input_is_unit_variance(kind):
    """Regression for the round-1 dpmpp_2m bug: the UNet input at step 0
    must be ~unit-variance (init scale and input scale must cancel),
    otherwise the model sees a sqrt(sigma_max^2+1) ~ 14.6x blown-up
    sample and produces garbage."""
    sched = schedulers.make_schedule(kind, 50)
    noise = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 4))
    x = schedulers.scale_initial_noise(sched, noise)
    x_in = schedulers.scale_model_input(sched, x, jnp.asarray(0))
    std = float(jnp.std(x_in))
    assert 0.9 < std < 1.1, std


@pytest.mark.parametrize("steps", [10, 50])
def test_perfect_denoiser_recovers_x0_ddim(steps):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (1, 4, 4, 2))
    noise = jax.random.normal(k2, x0.shape)
    sched = schedulers.make_schedule("ddim", steps)
    a0 = sched.alphas_cumprod[sched.timesteps[0]]
    x = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * noise

    def model_fn(x_in, t, i):
        a = sched.alphas_cumprod[sched.timesteps[i]]
        return (x_in - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    out = sampling.denoise_loop(sched, model_fn, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_euler_single_step_formula():
    sched = schedulers.make_schedule("euler", 50)
    x = jnp.ones((1, 2, 2, 1)) * 3.0
    eps = jnp.ones_like(x) * 0.5
    st = schedulers.init_state(sched, x.shape)
    out, _ = schedulers.step(sched, st, eps, jnp.asarray(0), x)
    want = 3.0 + 0.5 * (float(sched.sigmas[1]) - float(sched.sigmas[0]))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_add_noise_roundtrip_euler():
    sched = schedulers.make_schedule("euler", 50)
    x0 = jnp.ones((1, 2, 2, 1))
    noise = jnp.full_like(x0, 2.0)
    noised = schedulers.add_noise(sched, x0, noise, jnp.asarray(10))
    np.testing.assert_allclose(
        np.asarray(noised), 1.0 + 2.0 * float(sched.sigmas[10]), rtol=1e-5)


def test_cfg_combine():
    uncond = jnp.zeros((2, 2))
    cond = jnp.ones((2, 2))
    out = sampling.cfg_combine(jnp.concatenate([uncond, cond]), 7.5)
    np.testing.assert_allclose(np.asarray(out), 7.5)
    assert out.shape == (2, 2)


def test_lcm_schedule_and_step():
    """LCM few-step mode: timesteps on the distillation grid; a perfect
    denoiser's x0 is recovered at the final step (consistency blend
    pulls toward x0); intermediate steps re-noise deterministically."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from omg_tpu.diffusion import schedulers

    sched = schedulers.make_schedule("lcm", 4)
    ts = np.asarray(sched.timesteps)
    assert len(ts) == 4 and (np.diff(ts) < 0).all()
    # diffusers skipping-step selection on the origin grid (k*20-1):
    # counts back from 999 by len(grid)//steps = 12 -> 999,759,519,279
    # (torch-parity-tested in test_scheduler_torch_parity.py)
    np.testing.assert_array_equal(ts, [999, 759, 519, 279])

    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    st = schedulers.init_state(sched, x0.shape, key=jax.random.PRNGKey(2))

    x = schedulers.add_noise(sched, x0, noise, jnp.int32(0))
    for i in range(4):
        t = sched.timesteps[i]
        a = sched.alphas_cumprod[t]
        # perfect epsilon for the current sample
        eps = (x.astype(jnp.float32) - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        x, st = schedulers.step(sched, st, eps, jnp.int32(i), x)
    # final output ~= x0: with scaled_timestep = t*10, c_skip at t=19 is
    # ~7e-6, so the consistency blend is essentially pure x0.
    err = float(jnp.abs(x - x0).mean())
    assert err < 0.01, err

    # determinism given the same key
    st2 = schedulers.init_state(sched, x0.shape, key=jax.random.PRNGKey(2))
    x2 = schedulers.add_noise(sched, x0, noise, jnp.int32(0))
    for i in range(4):
        t = sched.timesteps[i]
        a = sched.alphas_cumprod[t]
        eps = (x2.astype(jnp.float32) - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        x2, st2 = schedulers.step(sched, st2, eps, jnp.int32(i), x2)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))

"""Scheduler torch-parity: trajectory equality vs independent torch math.

VERDICT round-2 item 3: the models got independent torch
re-implementations for parity (tests/test_unet_torch_parity.py etc.);
the schedulers did not — and invariant-style tests masked a real DPM++
bug in round 1. Here each scheduler family is re-implemented in torch
fp64 following diffusers' step math (the reference delegates to
diffusers KarrasDiffusionSchedulers, src/pipelines/lora_pipeline.py:33,
176; SDXL-base ships EulerDiscrete with scaled_linear betas, leading
spacing, steps_offset=1), and full trajectories are compared at fp64:

  * EulerDiscreteScheduler — sigma-space first-order (diffusers
    scheduling_euler_discrete.step, s_churn=0),
  * DPMSolverMultistepScheduler — algorithm dpmsolver++ (data
    prediction), solver_order=2, lower_order_final, zero final sigma
    (diffusers scheduling_dpmsolver_multistep multistep_dpm_solver_
    second_order_update),
  * LCMScheduler — boundary-condition consistency sampling with
    timestep_scaling=10, sigma_data=0.5, skipping-step origin grid
    (diffusers scheduling_lcm.step),
  * DDIMScheduler — eta=0 (diffusers scheduling_ddim.step).

Covers scale_model_input and the initial-noise scaling, over full 50-
and 8-step runs, with an eps "model" that feeds the scaled input back
(so any sample-space convention error compounds and is caught).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from omg_tpu.diffusion import schedulers

SHAPE = (2, 8, 8, 4)
TRAIN_T = 1000


# ---------------------------------------------------------------------------
# torch fp64 references (independent re-implementations of diffusers math)
# ---------------------------------------------------------------------------


def _alphas_cumprod_t() -> torch.Tensor:
    betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, TRAIN_T,
                           dtype=torch.float64) ** 2
    return torch.cumprod(1.0 - betas, dim=0)


def _leading_timesteps(steps: int) -> np.ndarray:
    ratio = TRAIN_T // steps
    return (np.arange(steps) * ratio + 1)[::-1].copy().astype(np.int64)


def _interp_sigmas(timesteps: np.ndarray) -> torch.Tensor:
    a = _alphas_cumprod_t().numpy()
    sig = ((1 - a) / a) ** 0.5
    out = np.interp(timesteps.astype(np.float64), np.arange(TRAIN_T), sig)
    return torch.tensor(np.concatenate([out, [0.0]]), dtype=torch.float64)


class TorchEuler:
    """diffusers EulerDiscreteScheduler: leading spacing, steps_offset=1,
    linear sigma interpolation, epsilon prediction, s_churn=0."""

    def __init__(self, steps: int):
        self.timesteps = _leading_timesteps(steps)
        self.sigmas = _interp_sigmas(self.timesteps)
        self.init_noise_sigma = (self.sigmas.max() ** 2 + 1) ** 0.5

    def scale_model_input(self, x, i):
        return x / ((self.sigmas[i] ** 2 + 1) ** 0.5)

    def step(self, eps, i, x):
        sigma = self.sigmas[i]
        pred_original = x - sigma * eps
        derivative = (x - pred_original) / sigma
        return x + derivative * (self.sigmas[i + 1] - sigma)


class TorchDPMpp2M:
    """diffusers DPMSolverMultistepScheduler: algorithm_type
    "dpmsolver++", solver_order=2, epsilon prediction, leading grid,
    final sigma zero, lower_order_final=True."""

    def __init__(self, steps: int):
        self.steps = steps
        self.timesteps = _leading_timesteps(steps)
        self.sigmas = _interp_sigmas(self.timesteps)
        self.init_noise_sigma = torch.tensor(1.0, dtype=torch.float64)
        self.model_outputs = [None, None]
        self.lower_order_nums = 0

    @staticmethod
    def _alpha_sigma(sigma):
        # karras sigma -> (alpha_t, sigma_t) with alpha^2 + sigma^2 = 1
        alpha_t = 1.0 / (sigma ** 2 + 1) ** 0.5
        return alpha_t, sigma * alpha_t

    def scale_model_input(self, x, i):
        return x  # DPM samples stay unit-variance

    def _convert(self, eps, i, x):
        alpha_t, sigma_t = self._alpha_sigma(self.sigmas[i])
        return (x - sigma_t * eps) / alpha_t

    def step(self, eps, i, x):
        x0 = self._convert(eps, i, x)
        self.model_outputs[0], self.model_outputs[1] = \
            self.model_outputs[1], x0
        lower_order_final = i == self.steps - 1
        if self.lower_order_nums < 1 or lower_order_final:
            out = self._first_order(x0, i, x)
        else:
            out = self._second_order(i, x)
        self.lower_order_nums = min(self.lower_order_nums + 1, 1)
        return out

    def _first_order(self, x0, i, x):
        sigma_t, sigma_s = self.sigmas[i + 1], self.sigmas[i]
        alpha_t, sig_t = self._alpha_sigma(sigma_t)
        alpha_s, sig_s = self._alpha_sigma(sigma_s)
        if sigma_t == 0:
            return x0  # zero final sigma: exp(-h)->0, alpha_t->1
        lam_t = torch.log(alpha_t) - torch.log(sig_t)
        lam_s = torch.log(alpha_s) - torch.log(sig_s)
        h = lam_t - lam_s
        return (sig_t / sig_s) * x - alpha_t * (torch.exp(-h) - 1.0) * x0

    def _second_order(self, i, x):
        sigma_t = self.sigmas[i + 1]
        sigma_s0, sigma_s1 = self.sigmas[i], self.sigmas[i - 1]
        m0, m1 = self.model_outputs[1], self.model_outputs[0]
        alpha_t, sig_t = self._alpha_sigma(sigma_t)
        alpha_s0, sig_s0 = self._alpha_sigma(sigma_s0)
        alpha_s1, sig_s1 = self._alpha_sigma(sigma_s1)
        lam_t = torch.log(alpha_t) - torch.log(sig_t)
        lam_s0 = torch.log(alpha_s0) - torch.log(sig_s0)
        lam_s1 = torch.log(alpha_s1) - torch.log(sig_s1)
        h, h_0 = lam_t - lam_s0, lam_s0 - lam_s1
        r0 = h_0 / h
        d0 = m0
        d1 = (1.0 / r0) * (m0 - m1)
        return ((sig_t / sig_s0) * x
                - alpha_t * (torch.exp(-h) - 1.0) * d0
                - 0.5 * alpha_t * (torch.exp(-h) - 1.0) * d1)


class TorchLCM:
    """diffusers LCMScheduler: skipping-step origin grid
    (original_inference_steps=50), timestep_scaling=10, sigma_data=0.5,
    epsilon prediction. Per-step noise is injected (the jax side's
    PRNG stream) so only the step math is under test."""

    def __init__(self, steps: int, origin: int = 50):
        k = TRAIN_T // origin
        grid = np.arange(1, origin + 1) * k - 1
        skip = len(grid) // steps
        self.timesteps = grid[::-skip][:steps].astype(np.int64)
        self.steps = steps
        self.alphas_cumprod = _alphas_cumprod_t()
        self.init_noise_sigma = torch.tensor(1.0, dtype=torch.float64)

    def scale_model_input(self, x, i):
        return x

    def step(self, eps, i, x, noise):
        t = int(self.timesteps[i])
        a_t = self.alphas_cumprod[t]
        prev_t = (int(self.timesteps[i + 1])
                  if i + 1 < self.steps else t)
        a_prev = self.alphas_cumprod[prev_t]
        x0 = (x - (1 - a_t) ** 0.5 * eps) / a_t ** 0.5
        scaled = torch.tensor(float(t) * 10.0, dtype=torch.float64)
        sigma_data2 = 0.5 ** 2
        c_skip = sigma_data2 / (scaled ** 2 + sigma_data2)
        c_out = scaled / (scaled ** 2 + sigma_data2) ** 0.5
        denoised = c_out * x0 + c_skip * x
        if i == self.steps - 1:
            return denoised
        return a_prev ** 0.5 * denoised + (1 - a_prev) ** 0.5 * noise


class TorchDDIM:
    """diffusers DDIMScheduler: eta=0, epsilon prediction, leading
    spacing, set_alpha_to_one semantics for the final step."""

    def __init__(self, steps: int):
        self.timesteps = _leading_timesteps(steps)
        self.alphas_cumprod = _alphas_cumprod_t()
        self.ratio = TRAIN_T // steps
        self.init_noise_sigma = torch.tensor(1.0, dtype=torch.float64)

    def scale_model_input(self, x, i):
        return x

    def step(self, eps, i, x):
        t = int(self.timesteps[i])
        prev_t = t - self.ratio
        a_t = self.alphas_cumprod[t]
        a_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                  else torch.tensor(1.0, dtype=torch.float64))
        x0 = (x - (1 - a_t) ** 0.5 * eps) / a_t ** 0.5
        return a_prev ** 0.5 * x0 + (1 - a_prev) ** 0.5 * eps


# ---------------------------------------------------------------------------
# Trajectory harness
# ---------------------------------------------------------------------------


def _eps_model(steps: int):
    """Deterministic fp64 'UNet': eps = 0.25 * model_input + noise_i.
    Feeding the scaled input back makes sample-space errors compound."""
    rng = np.random.default_rng(0)
    noises = [rng.standard_normal(SHAPE) for _ in range(steps)]

    def f(model_input: np.ndarray, i: int) -> np.ndarray:
        return 0.25 * model_input + noises[i]

    return f


def _jax_trajectory(kind: str, steps: int, noise: np.ndarray, eps_fn,
                    lcm_key=None):
    """Run the omg_tpu scheduler eagerly at fp64. Returns per-step
    (model_input, next_sample) plus the schedule for constant checks."""
    with jax.enable_x64(True):
        sched = schedulers.make_schedule(kind, steps, dtype=jnp.float64)
        x = jnp.asarray(noise) * sched.init_noise_sigma
        state = schedulers.init_state(
            sched, x.shape, key=lcm_key if lcm_key is not None else None)
        inputs, samples = [], []
        for i in range(steps):
            xin = schedulers.scale_model_input(sched, x, jnp.asarray(i))
            inputs.append(np.asarray(xin, np.float64))
            eps = jnp.asarray(eps_fn(np.asarray(xin, np.float64), i))
            x, state = schedulers.step(sched, state, eps, jnp.asarray(i), x)
            samples.append(np.asarray(x, np.float64))
        return sched, inputs, samples


def _torch_trajectory(ref, steps: int, noise: np.ndarray, eps_fn,
                      lcm_noises=None):
    x = torch.tensor(noise, dtype=torch.float64) * ref.init_noise_sigma
    inputs, samples = [], []
    for i in range(steps):
        xin = ref.scale_model_input(x, i)
        inputs.append(xin.numpy())
        eps = torch.tensor(eps_fn(xin.numpy(), i), dtype=torch.float64)
        if lcm_noises is not None:
            x = ref.step(eps, i, x, torch.tensor(lcm_noises[i],
                                                 dtype=torch.float64))
        else:
            x = ref.step(eps, i, x)
        samples.append(x.numpy())
    return inputs, samples


def _compare(jax_tr, torch_tr, rtol=1e-9, atol=1e-10,
             sample_to_unit=None, sched=None):
    """Per-step equality of model inputs and samples. ``sample_to_unit``
    converts the jax sample at step i+1 into torch's space (DPM: jax is
    karras-space, diffusers is unit-variance)."""
    j_in, j_s = jax_tr
    t_in, t_s = torch_tr
    for i, (a, b) in enumerate(zip(j_in, t_in)):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg=f"model input at step {i}")
    for i, (a, b) in enumerate(zip(j_s, t_s)):
        if sample_to_unit is not None:
            a = sample_to_unit(a, i)
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg=f"sample after step {i}")


@pytest.fixture(scope="module")
def noise():
    return np.random.default_rng(7).standard_normal(SHAPE)


@pytest.mark.parametrize("steps", [50, 8])
def test_euler_matches_torch(noise, steps):
    eps_fn = _eps_model(steps)
    sched, j_in, j_s = _jax_trajectory("euler", steps, noise, eps_fn)
    ref = TorchEuler(steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps),
                                  ref.timesteps)
    np.testing.assert_allclose(np.asarray(sched.sigmas),
                               ref.sigmas.numpy(), rtol=1e-12)
    np.testing.assert_allclose(float(sched.init_noise_sigma),
                               float(ref.init_noise_sigma), rtol=1e-12)
    t_in, t_s = _torch_trajectory(ref, steps, noise, eps_fn)
    _compare((j_in, j_s), (t_in, t_s))


@pytest.mark.parametrize("steps", [50, 8])
def test_dpmpp_2m_matches_torch(noise, steps):
    """omg_tpu's DPM++2M lives in karras space (x = x0 + sigma*eps);
    diffusers' samples are unit-variance (x_u = alpha_t * x_k). Both see
    the same model input, and samples must agree after conversion."""
    eps_fn = _eps_model(steps)
    sched, j_in, j_s = _jax_trajectory("dpmpp_2m", steps, noise, eps_fn)
    ref = TorchDPMpp2M(steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps),
                                  ref.timesteps)
    sig = np.asarray(sched.sigmas)

    def to_unit(x_k, i):
        s = sig[i + 1]  # sample after step i sits at sigma[i+1]
        return x_k / (s ** 2 + 1) ** 0.5

    # jax initial sample: noise * sqrt(sigma_max^2+1) (karras); torch:
    # noise (unit) — consistent via the same conversion at sigma_max.
    t_in, t_s = _torch_trajectory(ref, steps, noise, eps_fn)
    _compare((j_in, j_s), (t_in, t_s), sample_to_unit=to_unit)


@pytest.mark.parametrize("steps", [8, 4])
def test_lcm_matches_torch(noise, steps):
    """LCM: the jax side draws re-noise from fold_in(key, i); the exact
    same stream is fed to the torch reference, so the boundary-condition
    step math (c_skip/c_out, re-noising, final denoised return) is what
    is compared."""
    eps_fn = _eps_model(steps)
    with jax.enable_x64(True):
        key = jax.random.PRNGKey(3)
        lcm_noises = [np.asarray(jax.random.normal(
            jax.random.fold_in(key, i), SHAPE, jnp.float64))
            for i in range(steps)]
    sched, j_in, j_s = _jax_trajectory("lcm", steps, noise, eps_fn,
                                       lcm_key=jax.random.PRNGKey(3))
    ref = TorchLCM(steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps),
                                  ref.timesteps)
    t_in, t_s = _torch_trajectory(ref, steps, noise, eps_fn,
                                  lcm_noises=lcm_noises)
    _compare((j_in, j_s), (t_in, t_s))


@pytest.mark.parametrize("steps", [50, 8])
def test_ddim_matches_torch(noise, steps):
    eps_fn = _eps_model(steps)
    sched, j_in, j_s = _jax_trajectory("ddim", steps, noise, eps_fn)
    ref = TorchDDIM(steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps),
                                  ref.timesteps)
    t_in, t_s = _torch_trajectory(ref, steps, noise, eps_fn)
    _compare((j_in, j_s), (t_in, t_s))


def test_lcm_timesteps_skipping_grid():
    """8 of 50 origin steps: diffusers' [::-skip] selection — counts
    back from 999 by 120."""
    sched = schedulers.make_schedule("lcm", 8)
    np.testing.assert_array_equal(
        np.asarray(sched.timesteps),
        [999, 879, 759, 639, 519, 399, 279, 159])

"""DDPM noise scheduler + diffusion prior (x0-prediction, cosine schedule).

Re-derivation of the dalle2_pytorch ``NoiseScheduler`` / ``DiffusionPrior``
behaviour that ``InstructDiffusionPrior`` pins down
(/root/reference/models/diffusion_prior.py:315-456 and
train_diffusion_prior.py:983-991): cosine beta schedule (Nichol & Dhariwal,
s=0.008, betas clipped to 0.999), predict_x_start=True, l2 loss,
image_embed_scale = sqrt(dim), timesteps=100, cond_drop_prob=0.2, and
sampling with cond_scale=1.0 (train_diffusion_prior.py:828-831).

TPU-first: the 100-step ancestral sampling loop is ONE jitted
``lax.scan`` — the schedule tensors are closed-over constants, every step is
a 3-token transformer forward, and the whole style-embedding sample costs a
single device dispatch (the reference pays ~100 python-loop dispatches,
diffusion_prior.py:357-362).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .prior_transformer import PriorTransformerNetwork, l2norm


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


@dataclasses.dataclass(frozen=True)
class NoiseScheduler:
    """Precomputed DDPM schedule tensors (host numpy -> closed over in jit)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    posterior_log_variance_clipped: np.ndarray

    @classmethod
    def create(cls, timesteps: int, beta_schedule: str = "cosine") -> "NoiseScheduler":
        if beta_schedule != "cosine":
            raise ValueError("only the cosine schedule is used by the reference")
        betas = cosine_beta_schedule(timesteps)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.concatenate([[1.0], acp[:-1]])
        posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
        return cls(
            betas=betas,
            alphas_cumprod=acp,
            alphas_cumprod_prev=acp_prev,
            sqrt_alphas_cumprod=np.sqrt(acp),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - acp),
            posterior_mean_coef1=betas * np.sqrt(acp_prev) / (1.0 - acp),
            posterior_mean_coef2=(1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
            posterior_log_variance_clipped=np.log(
                np.maximum(posterior_variance, 1e-20)
            ),
        )

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def _gather(self, arr: np.ndarray, t: jax.Array, ndim: int) -> jax.Array:
        out = jnp.asarray(arr, dtype=jnp.float32)[t]
        return out.reshape(t.shape + (1,) * (ndim - 1))

    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        return (
            self._gather(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior(
        self, x_start: jax.Array, x_t: jax.Array, t: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        mean = (
            self._gather(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + self._gather(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        log_var = self._gather(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, log_var


@dataclasses.dataclass(frozen=True)
class DiffusionPrior:
    """InstructDiffusionPrior equivalent: trains/samples a 128-d style
    embedding conditioned on a (regressed) CLIP text embedding."""

    net: PriorTransformerNetwork
    scheduler: NoiseScheduler
    image_embed_scale: Optional[float] = None  # default sqrt(dim)
    text_cond_drop_prob: float = 0.2
    image_cond_drop_prob: float = 0.2
    sampling_clamp_l2norm: bool = False
    training_clamp_l2norm: bool = False
    init_image_embed_l2norm: bool = False
    sampling_final_clamp_l2norm: bool = False

    @property
    def embed_scale(self) -> float:
        return (
            self.image_embed_scale
            if self.image_embed_scale is not None
            else self.net.dim ** 0.5
        )

    # ---------------- losses (training) ----------------

    def p_losses(
        self,
        params,
        image_embed: jax.Array,  # (B, n, D), already scaled
        times: jax.Array,  # (B,) int32
        text_embed: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        rng_noise, rng_keep = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, image_embed.shape, image_embed.dtype)
        noisy = self.scheduler.q_sample(image_embed, times, noise)
        pred = self.net.apply(
            params,
            noisy,
            times,
            text_embed,
            brain_cond_drop_prob=self.text_cond_drop_prob,
            image_cond_drop_prob=self.image_cond_drop_prob,
            keep_rng=rng_keep,
        )
        if self.training_clamp_l2norm:
            pred = l2norm(pred) * self.embed_scale
        target = image_embed  # predict_x_start
        loss = jnp.mean((pred - target) ** 2)
        return loss, pred

    def loss(
        self,
        params,
        text_embed: jax.Array,  # (B, D) or (B, n, D)
        image_embed: jax.Array,  # (B, D) or (B, n, D), UNscaled
        rng: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        """forward() equivalent: samples random times, scales the target
        (diffusion_prior.py:402-456)."""
        B = image_embed.shape[0]
        image_embed = image_embed.reshape(B, -1, self.net.dim)
        rng_t, rng_l = jax.random.split(rng)
        times = jax.random.randint(rng_t, (B,), 0, self.scheduler.num_timesteps)
        return self.p_losses(
            params, image_embed * self.embed_scale, times, text_embed, rng_l
        )

    # ---------------- sampling (inference) ----------------

    def p_mean_log_variance(
        self, params, x: jax.Array, t: jax.Array, text_embed: jax.Array,
        cond_scale: float = 1.0,
    ):
        if cond_scale == 1.0:
            pred = self.net.apply(params, x, t, text_embed)
        else:
            cond = self.net.apply(params, x, t, text_embed)
            null = self.net.apply(
                params, x, t, text_embed,
                brain_cond_drop_prob=1.0, image_cond_drop_prob=1.0,
            )
            pred = null + (cond - null) * cond_scale
        x_start = pred  # predict_x_start
        if self.sampling_clamp_l2norm:
            x_start = l2norm(x_start) * self.embed_scale
        mean, log_var = self.scheduler.q_posterior(x_start, x, t)
        return mean, log_var, x_start

    def p_sample_loop(
        self,
        params,
        shape: Tuple[int, ...],  # (B, n, D)
        text_embed: jax.Array,
        rng: jax.Array,
        cond_scale: float = 1.0,
        image_embed: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Full ancestral DDPM sampling as one lax.scan (jittable)."""
        B = shape[0]
        rng_init, rng_loop = jax.random.split(rng)
        if image_embed is None:
            image_embed = jax.random.normal(rng_init, shape)
        if self.init_image_embed_l2norm:
            image_embed = l2norm(image_embed) * self.embed_scale

        timesteps = self.scheduler.num_timesteps

        def step(carry, i):
            x, rng = carry
            rng, rng_noise = jax.random.split(rng)
            t_scalar = timesteps - 1 - i
            t = jnp.full((B,), t_scalar, dtype=jnp.int32)
            mean, log_var, _ = self.p_mean_log_variance(
                params, x, t, text_embed, cond_scale
            )
            noise = jax.random.normal(rng_noise, x.shape, x.dtype)
            nonzero = (t_scalar > 0).astype(x.dtype)
            x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
            return (x, rng), None

        (x, _), _ = jax.lax.scan(
            step, (image_embed, rng_loop), jnp.arange(timesteps)
        )
        if self.sampling_final_clamp_l2norm:
            x = l2norm(x) * self.embed_scale
        # dalle2's public p_sample_loop un-scales the sampled embedding
        # (training targets were scaled by image_embed_scale); the reference
        # relies on this when feeding the sample to EMOTE as a style emb.
        return x / self.embed_scale

    def ddim_sample_loop(
        self,
        params,
        shape: Tuple[int, ...],
        text_embed: jax.Array,
        rng: jax.Array,
        steps: int = 20,
        eta: float = 0.0,
        cond_scale: float = 1.0,
    ) -> jax.Array:
        """DDIM sampling with a strided timestep subset (dalle2's fast path
        when sampling with fewer timesteps than trained). ``eta=0`` is
        deterministic given the initial noise — a ~5x cheaper serving option
        than the 100-step ancestral loop."""
        T = self.scheduler.num_timesteps
        times = np.linspace(-1, T - 1, steps + 1).astype(int)[::-1]
        pairs = list(zip(times[:-1], times[1:]))  # (t, t_prev), static

        acp = jnp.asarray(self.scheduler.alphas_cumprod, jnp.float32)
        rng_init, rng_loop = jax.random.split(rng)
        x = jax.random.normal(rng_init, shape)
        if self.init_image_embed_l2norm:
            x = l2norm(x) * self.embed_scale

        B = shape[0]
        for t, t_prev in pairs:
            tb = jnp.full((B,), t, jnp.int32)
            if cond_scale == 1.0:
                pred = self.net.apply(params, x, tb, text_embed)
            else:
                cond = self.net.apply(params, x, tb, text_embed)
                null = self.net.apply(
                    params, x, tb, text_embed,
                    brain_cond_drop_prob=1.0, image_cond_drop_prob=1.0,
                )
                pred = null + (cond - null) * cond_scale
            x_start = pred  # predict_x_start
            if self.sampling_clamp_l2norm:
                x_start = l2norm(x_start) * self.embed_scale
            a_t = acp[t]
            a_prev = acp[t_prev] if t_prev >= 0 else jnp.asarray(1.0)
            eps = (x - jnp.sqrt(a_t) * x_start) / jnp.sqrt(1.0 - a_t)
            sigma = eta * jnp.sqrt(
                (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
            x = jnp.sqrt(a_prev) * x_start + dir_xt
            if eta > 0:
                rng_loop, r = jax.random.split(rng_loop)
                x = x + sigma * jax.random.normal(r, x.shape, x.dtype)
        if self.sampling_final_clamp_l2norm:
            x = l2norm(x) * self.embed_scale
        return x / self.embed_scale

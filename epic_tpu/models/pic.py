"""VarianceMaskingPIC — the paper's progressive image compression model.

Reference behavior: src/models/pic.py:25-967. An image is encoded as a
base-quality latent (first 320 channels, 10 slices, channel-autoregressive
with <=5-slice support) plus a residual latent (delta between the top and
base representations, 10 more slices). Each residual slice is masked to its
top q*10% highest-predicted-std elements; untransmitted elements decode to
the predicted mean.

TPU-native restructuring (vs the reference's per-quality Python loops):

* NHWC everywhere; channel slices are contiguous 32-wide blocks on the
  last (lane) axis.
* With ``all_scalable=True`` (the paper's configuration) the progressive
  entropy-parameter chain depends only on the base latent — never on the
  mask or quality (reference recomputes it per quality at pic.py:396-457;
  the single-bitstream decoder already exploits this via its cached
  ``entropy_data``, functions_decode.py:119-173). We compute it ONCE.
* The multi-quality forward folds quality levels into the batch axis, so
  masking/LRP/synthesis over L quality levels is one batched conv pass.
* All compress/decompress device math is expressed as module methods so the
  encoder and decoder execute the *same* compiled programs for entropy
  parameters — the decoder-side mask identity then holds bitwise.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.bottleneck import EntropyBottleneck
from ..entropy.gaussian import gaussian_likelihood, build_indexes as gc_build_indexes
from ..entropy.gaussian import get_scale_table
from ..entropy.ops import ste_round
from ..ops import variance_mask, apply_noise_mask
from .builder import (
    AnalysisTransform,
    HyperAnalysis,
    HyperSynthesis,
    ParamNet,
    SynthesisTransform,
)


class VarianceMaskingPIC(nn.Module):
    """Config mirrors the reference constructor (pic.py:27-69)."""

    n: int = 192
    m: int = 640
    division: Sequence[int] = (320, 640)
    dim_chunk: int = 32
    multiple_encoder: bool = True
    multiple_decoder: bool = True
    multiple_hyperprior: bool = True
    support_progressive_slices: int = 5
    max_support_slices: int = 5
    delta_encode: bool = True
    total_mu_rep: bool = True
    all_scalable: bool = True
    mask_policy: str = "point-based-std"
    scale_bound: float = 0.11
    # widths of the per-slice entropy-parameter heads; the reference's
    # 224-176-128-64 stack by default, shrinkable for tiny test configs
    param_net_widths: Sequence[int] = (224, 176, 128, 64)
    # conv/attention computation dtype: "float32" (safe default) or
    # "bfloat16" (MXU throughput). Entropy parameters, GDN math, masks and
    # likelihoods always stay float32; enc/dec bit-identity is preserved
    # either way because both sides run the same compiled programs.
    compute_dtype: str = "float32"

    # ---- derived sizes ----
    @property
    def num_slices(self) -> int:
        return self.m // self.dim_chunk

    @property
    def ns0(self) -> int:
        return self.division[0] // self.dim_chunk

    @property
    def ns1(self) -> int:
        return self.division[1] // self.dim_chunk

    def setup(self):
        d0 = self.division[0]
        dt = None if self.compute_dtype == "float32" else \
            jnp.dtype(self.compute_dtype)
        if self.multiple_encoder:
            self.g_a = [AnalysisTransform(self.n, d0, dt, name=f"g_a_{i}")
                        for i in range(2)]
        else:
            self.g_a = AnalysisTransform(self.n, self.m, dt, name="g_a")
        if self.multiple_decoder:
            self.g_s = [SynthesisTransform(self.n, d0, dt, name=f"g_s_{i}")
                        for i in range(2)]
        else:
            self.g_s = SynthesisTransform(self.n, d0, dt, name="g_s")
        self.h_a = HyperAnalysis(self.n, dt, name="h_a")
        if self.multiple_hyperprior:
            self.h_mean_s = [HyperSynthesis(d0, dt, name=f"h_mean_s_{i}")
                             for i in range(2)]
            self.h_scale_s = [HyperSynthesis(d0, dt, name=f"h_scale_s_{i}")
                              for i in range(2)]
        else:
            # single-hyperprior: first conv width is N, not 192
            # (reference builder.py:114 conv3x3(N, N))
            self.h_mean_s = HyperSynthesis(self.m, dt, first_width=self.n,
                                           name="h_mean_s")
            self.h_scale_s = HyperSynthesis(self.m, dt, first_width=self.n,
                                            name="h_scale_s")

        ns0 = self.ns0
        nprog = self.ns1 - self.ns0
        pw = tuple(self.param_net_widths)
        self.cc_mean = [ParamNet(self.dim_chunk, pw, dt, name=f"cc_mean_{i}")
                        for i in range(ns0)]
        self.cc_scale = [
            ParamNet(self.dim_chunk, pw, dt, name=f"cc_scale_{i}")
            for i in range(ns0)]
        self.lrp = [ParamNet(self.dim_chunk, pw, dt, name=f"lrp_{i}")
                    for i in range(ns0)]
        self.cc_mean_prog = [
            ParamNet(self.dim_chunk, pw, dt, name=f"cc_mean_prog_{i}")
            for i in range(nprog)]
        self.cc_scale_prog = [
            ParamNet(self.dim_chunk, pw, dt, name=f"cc_scale_prog_{i}")
            for i in range(nprog)]
        self.lrp_prog = [
            ParamNet(self.dim_chunk, pw, dt, name=f"lrp_prog_{i}")
            for i in range(ns0)]
        self.entropy_bottleneck = EntropyBottleneck(self.n,
                                                    name="entropy_bottleneck")

    # ------------------------------------------------------------------
    # building blocks (each usable standalone via module.apply(method=...))
    # ------------------------------------------------------------------

    def latent(self, x):
        """g_a: [B,H,W,3] -> y [B,h,w,M]."""
        if self.multiple_encoder:
            return jnp.concatenate([self.g_a[0](x), self.g_a[1](x)], axis=-1)
        return self.g_a(x)

    def hyper_analysis(self, y):
        return self.h_a(y)

    def z_medians(self):
        return self.entropy_bottleneck.medians()[:, 0, 0]  # [N]

    def z_hat_ste(self, z):
        """STE-rounded z around the learned medians (pic.py:282-284)."""
        med = self.z_medians()
        return ste_round(z - med) + med

    def hyper_synthesis(self, z_hat):
        """-> (latent_means, latent_scales), both [B,h,w,M]."""
        if self.multiple_hyperprior:
            means = jnp.concatenate(
                [self.h_mean_s[0](z_hat), self.h_mean_s[1](z_hat)], axis=-1)
            scales = jnp.concatenate(
                [self.h_scale_s[0](z_hat), self.h_scale_s[1](z_hat)], axis=-1)
        else:
            means = self.h_mean_s(z_hat)
            scales = self.h_scale_s(z_hat)
        return means, scales

    def hyper_synthesis_base(self, z_hat):
        """Base branch only — all the q=0 decoder needs (pic.py:848-850)."""
        if self.multiple_hyperprior:
            return self.h_mean_s[0](z_hat), self.h_scale_s[0](z_hat)
        m, s = self.h_mean_s(z_hat), self.h_scale_s(z_hat)
        return m[..., :self.division[0]], s[..., :self.division[0]]

    def _slice(self, y, i):
        c = self.dim_chunk
        return y[..., i * c:(i + 1) * c]

    def base_slice_params(self, latent_means, latent_scales,
                          support: List[jnp.ndarray], i: int):
        """Entropy params for base slice i given decoded support slices.

        latent_means/scales: base 320-ch hyper outputs. support: previous
        y_hat slices [:min(5, i)]. Returns (mu, scale, mean_support).
        Reference: pic.py:330-347.
        """
        # max_support_slices < 0 = use ALL decoded slices (reference:
        # pic.py:333-336)
        k = len(support) if self.max_support_slices < 0 else \
            min(self.max_support_slices, i)
        sup = support[:k]
        mean_support = jnp.concatenate([latent_means] + list(sup), axis=-1)
        scale_support = jnp.concatenate([latent_scales] + list(sup), axis=-1)
        mu = self.cc_mean[i](mean_support)
        scale = self.cc_scale[i](scale_support)
        return mu, scale, mean_support

    def finish_base_slice(self, y_hat_raw, mean_support, i: int):
        """Apply the latent-residual-prediction refinement
        (reference: pic.py:358-361). y_hat_raw = dequantized slice."""
        lrp_in = jnp.concatenate([mean_support, y_hat_raw], axis=-1)
        return y_hat_raw + 0.5 * jnp.tanh(self.lrp[i](lrp_in))

    def prog_slice_params(self, latent_means, latent_scales, y_hat_base_i,
                          mu_support: List[jnp.ndarray],
                          std_support: List[jnp.ndarray], i: int):
        """Entropy params for progressive slice i.

        latent_means/scales: enhancement 320-ch hyper outputs. Support =
        [base y_hat_i] + up to 5 previous mu_total / std_total tensors
        (all_scalable) or previous decoded prog slices.
        Returns (mu, mu_total_entry, scale, mean_support).
        Reference: pic.py:396-427 and test/utils.py:35-55.
        """
        k = min(self.support_progressive_slices, i)
        sup_mu = [y_hat_base_i] + list(mu_support[len(mu_support) - k:]) \
            if self.support_progressive_slices > 0 and i > 0 else [y_hat_base_i]
        sup_std = [y_hat_base_i] + list(std_support[len(std_support) - k:]) \
            if self.support_progressive_slices > 0 and i > 0 else [y_hat_base_i]
        mean_support = jnp.concatenate([latent_means] + sup_mu, axis=-1)
        scale_support = jnp.concatenate([latent_scales] + sup_std, axis=-1)
        mu = self.cc_mean_prog[i](mean_support)
        mut = mu + y_hat_base_i if self.total_mu_rep else mu
        scale = self.cc_scale_prog[i](scale_support)
        return mu, mut, scale, mean_support

    def finish_prog_slice(self, y_hat_raw, mean_support, y_hat_base_i,
                          i: int):
        """LRP + merge with the base slice (reference: pic.py:446-451)."""
        lrp_in = jnp.concatenate([mean_support, y_hat_raw], axis=-1)
        y_hat = y_hat_raw + 0.5 * jnp.tanh(self.lrp_prog[i](lrp_in))
        return y_hat + y_hat_base_i

    def synthesize_base(self, y_hat_base):
        g = self.g_s[0] if self.multiple_decoder else self.g_s
        return g(y_hat_base)

    def synthesize_prog(self, y_hat_prog):
        g = self.g_s[1] if self.multiple_decoder else self.g_s
        return g(y_hat_prog)

    # ------------------------------------------------------------------
    # shared chains
    # ------------------------------------------------------------------

    def _base_chain(self, y, latent_means, latent_scales,
                    training: bool, rng=None):
        """All 10 base slices (sequential by construction). Returns
        (y_hat_slices, likelihoods, mus, scales, mean_supports)."""
        lm = latent_means[..., :self.division[0]]
        ls = latent_scales[..., :self.division[0]]
        y_hat_slices, liks, mus, scales, msups = [], [], [], [], []
        for i in range(self.ns0):
            y_i = self._slice(y, i)
            mu, scale, msup = self.base_slice_params(lm, ls, y_hat_slices, i)
            if training:
                rng, sub = jax.random.split(rng)
                noisy = y_i + jax.random.uniform(
                    sub, y_i.shape, y_i.dtype, -0.5, 0.5)
            else:
                noisy = ste_round(y_i - mu) + mu
            liks.append(gaussian_likelihood(noisy, scale, mu,
                                            self.scale_bound))
            y_hat = ste_round(y_i - mu) + mu
            y_hat = self.finish_base_slice(y_hat, msup, i)
            y_hat_slices.append(y_hat)
            mus.append(mu)
            scales.append(scale)
            msups.append(msup)
        return y_hat_slices, liks, mus, scales, msups, rng

    def _prog_param_chain(self, y_hat_base_slices, latent_means,
                          latent_scales):
        """Quality-independent progressive entropy-parameter chain
        (all_scalable=True, the paper's configuration). Returns
        (mus, muts, scales, mean_supports)."""
        lm = latent_means[..., self.division[0]:]
        ls = latent_scales[..., self.division[0]:]
        mus, muts, scales, msups = [], [], [], []
        for i in range(self.ns1 - self.ns0):
            mu, mut, scale, msup = self.prog_slice_params(
                lm, ls, y_hat_base_slices[i], muts, scales, i)
            mus.append(mu)
            muts.append(mut)
            scales.append(scale)
            msups.append(msup)
        return mus, muts, scales, msups

    def _prog_slices_non_scalable(self, y, quality, y_hat_base_slices,
                                  latent_means, latent_scales,
                                  mask_policy: str, training: bool,
                                  rng, checkpoint_ref=None,
                                  mus_b=None, scales_b=None):
        """Per-quality progressive chain for all_scalable=False: the
        support is the DECODED progressive slices of this quality level
        (reference: pic.py:404-405 with support_vector =
        y_hat_slices_quality), so params are recomputed per quality and the
        chain interleaves with reconstruction. Returns (y_hat_slices,
        likelihoods, mus, scales, rng)."""
        lm = latent_means[..., self.division[0]:]
        ls = latent_scales[..., self.division[0]:]
        prog_slices, liks, mus, scales = [], [], [], []
        for i in range(self.ns1 - self.ns0):
            r_i = self._slice(y, self.ns0 + i)
            if self.delta_encode:
                r_i = r_i - self._slice(y, i)
            mu, mut, scale, msup = self.prog_slice_params(
                lm, ls, y_hat_base_slices[i], prog_slices, prog_slices, i)
            if checkpoint_ref is not None:
                mu, scale = self._refine_prog_params(
                    i, quality, mu, scale, checkpoint_ref,
                    mus_b[i], scales_b[i])
            mask = apply_noise_mask(
                variance_mask(scale, quality, mask_policy), False)
            centered = (r_i - mu) * mask
            if training:
                rng, sub = jax.random.split(rng)
                noisy = centered + jax.random.uniform(
                    sub, centered.shape, centered.dtype, -0.5, 0.5)
            else:
                noisy = ste_round(centered)
            liks.append(gaussian_likelihood(
                noisy, scale * mask, None, self.scale_bound))
            y_hat_i = ste_round(r_i - mu) * mask + mu
            y_hat_i = self.finish_prog_slice(y_hat_i, msup,
                                             y_hat_base_slices[i], i)
            prog_slices.append(y_hat_i)
            mus.append(mu)
            scales.append(scale)
        return prog_slices, liks, mus, scales, rng

    def prog_params_all(self, y_hat_base, latent_means, latent_scales):
        """Standalone entry: stacked (mu, scale, mean_support) for all
        progressive slices, from the concatenated base latent. Used by
        both codec sides (the cached ``entropy_data`` equivalent)."""
        slices = [self._slice(y_hat_base, i) for i in range(self.ns0)]
        mus, muts, scales, msups = self._prog_param_chain(
            slices, latent_means, latent_scales)
        # mean_supports are ragged in channels -> keep as a tuple
        return jnp.stack(mus), jnp.stack(scales), tuple(msups)

    # ------------------------------------------------------------------
    # forward passes
    # ------------------------------------------------------------------

    def __call__(self, x, quality: Optional[Sequence[float]] = None,
                 training: bool = True, mask_policy: Optional[str] = None):
        """Multi-quality training forward (reference: pic.py:301-491).

        Returns x_hat stacked [1+L, B, H, W, 3] (base first), likelihoods
        {y: [B,h,w,320], y_prog: [L,B,h,w,640], z}.
        """
        mask_policy = mask_policy or self.mask_policy
        qualities = self._define_quality(quality)
        rng = self.make_rng("noise") if training else None

        y = self.latent(x)
        z = self.h_a(y)
        if training:
            rng, sub = jax.random.split(rng)
            _, z_lik = self.entropy_bottleneck(z, True, sub)
        else:
            _, z_lik = self.entropy_bottleneck(z, False)
        z_hat = self.z_hat_ste(z)
        latent_means, latent_scales = self.hyper_synthesis(z_hat)

        (y_hat_slices, base_liks, _, _, _, rng) = self._base_chain(
            y, latent_means, latent_scales, training, rng)
        y_hat_b = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat_base = self.synthesize_base(y_hat_b)
        y_lik_base = jnp.concatenate(base_liks, axis=-1)

        prog_qs = [q for q in qualities if q != 0] or []
        if self.ns1 == self.ns0:
            prog_qs = []  # single-quality models (WACNN) have no prog stage
        if not prog_qs:
            return {
                "x_hat": x_hat_base[None],
                "likelihoods": {"y": y_lik_base, "z": z_lik},
                "y_base": y_hat_b,
            }

        if not self.all_scalable:
            # quality-dependent support: per-quality interleaved chains
            # (reference pic.py:388-457 structure)
            x_hats, lik_levels = [x_hat_base[None]], []
            for q in prog_qs:
                prog_slices, liks, _, _, rng = \
                    self._prog_slices_non_scalable(
                        y, q, y_hat_slices, latent_means, latent_scales,
                        mask_policy, training, rng)
                y_hat_q = jnp.concatenate(prog_slices, axis=-1)
                x_hats.append(self.synthesize_prog(y_hat_q)[None])
                lik_levels.append(jnp.concatenate(
                    [y_lik_base] + liks, axis=-1)[None])
            return {
                "x_hat": jnp.concatenate(x_hats, axis=0),
                "likelihoods": {"y": y_lik_base,
                                "y_prog": jnp.concatenate(lik_levels, 0),
                                "z": z_lik},
                "y_base": y_hat_b,
                "y_prog": y_hat_q,
            }

        mus, muts, scales, msups = self._prog_param_chain(
            y_hat_slices, latent_means, latent_scales)

        L = len(prog_qs)
        b = x.shape[0]
        y_hat_prog_slices = []  # each [L,B,h,w,32]
        prog_liks = []
        for i in range(self.ns1 - self.ns0):
            r_i = self._slice(y, self.ns0 + i)
            if self.delta_encode:
                r_i = r_i - self._slice(y, i)
            mu, scale = mus[i], scales[i]
            # [L,B,h,w,32] masks for every requested quality
            mask = jnp.stack(
                [apply_noise_mask(
                    variance_mask(scale, q, mask_policy), False)
                 for q in prog_qs])
            centered = (r_i - mu)[None] * mask
            if training:
                rng, sub = jax.random.split(rng)
                noisy = centered + jax.random.uniform(
                    sub, centered.shape, centered.dtype, -0.5, 0.5)
            else:
                noisy = ste_round(centered)
            prog_liks.append(gaussian_likelihood(
                noisy, scale[None] * mask, None, self.scale_bound))
            y_hat_i = ste_round(r_i[None] - mu[None]) * mask + mu[None]
            # fold qualities into batch for LRP + merge
            flat = y_hat_i.reshape((L * b,) + y_hat_i.shape[2:])
            msup_rep = jnp.broadcast_to(
                msups[i][None], (L,) + msups[i].shape
            ).reshape((L * b,) + msups[i].shape[1:])
            base_rep = jnp.broadcast_to(
                y_hat_slices[i][None], (L,) + y_hat_slices[i].shape
            ).reshape((L * b,) + y_hat_slices[i].shape[1:])
            flat = self.finish_prog_slice(flat, msup_rep, base_rep, i)
            y_hat_prog_slices.append(
                flat.reshape((L, b) + flat.shape[1:]))

        y_hat_prog = jnp.concatenate(y_hat_prog_slices, axis=-1)  # [L,B,h,w,320]
        x_hat_prog = self.synthesize_prog(
            y_hat_prog.reshape((L * b,) + y_hat_prog.shape[2:]))
        x_hat_prog = x_hat_prog.reshape((L, b) + x_hat_prog.shape[1:])

        # per-level likelihood = base slices + that level's prog slices
        # (reference: pic.py:390, 457, 471)
        y_lik_prog = jnp.concatenate(prog_liks, axis=-1)  # [L,B,h,w,320]
        base_rep = jnp.broadcast_to(
            y_lik_base[None], (L,) + y_lik_base.shape)
        y_lik_levels = jnp.concatenate([base_rep, y_lik_prog], axis=-1)

        return {
            "x_hat": jnp.concatenate([x_hat_base[None], x_hat_prog], axis=0),
            "likelihoods": {"y": y_lik_base, "y_prog": y_lik_levels,
                            "z": z_lik},
            "y_base": y_hat_b,
            "y_prog": y_hat_prog,
            "prog_scales": jnp.stack(scales),
            "prog_mus": jnp.stack(mus),
        }

    def _refine_prog_params(self, i: int, quality, mu, scale,
                            checkpoint_ref, mu_base_i, std_base_i):
        """Hook for Rate Enhancement Modules (overridden by the REM
        subclass). Returns possibly-refined (mu, scale) used for masking and
        coding of slice i; the support chain always uses the unrefined
        values (reference: rem_pic.py:560-581)."""
        del i, quality, checkpoint_ref, mu_base_i, std_base_i
        return mu, scale

    def forward_single_quality(self, x, quality, training: bool = False,
                               mask_policy: Optional[str] = None,
                               checkpoint_ref=None):
        """One-quality forward (reference: pic.py:497-666). quality may be
        a python float (static) or a traced scalar (sampling training)."""
        mask_policy = mask_policy or self.mask_policy
        rng = self.make_rng("noise") if training else None

        y = self.latent(x)
        z = self.h_a(y)
        if training:
            rng, sub = jax.random.split(rng)
            _, z_lik = self.entropy_bottleneck(z, True, sub)
        else:
            _, z_lik = self.entropy_bottleneck(z, False)
        z_hat = self.z_hat_ste(z)
        latent_means, latent_scales = self.hyper_synthesis(z_hat)

        (y_hat_slices, base_liks, mus_b, scales_b, _, rng) = self._base_chain(
            y, latent_means, latent_scales, training, rng)
        y_hat_b = jnp.concatenate(y_hat_slices, axis=-1)
        y_lik_base = jnp.concatenate(base_liks, axis=-1)

        static_q = isinstance(quality, (int, float))
        if static_q and quality == 0:
            x_hat = jnp.clip(self.synthesize_base(y_hat_b), 0.0, 1.0)
            return {
                "x_hat": x_hat,
                "likelihoods": {"y": y_lik_base, "z": z_lik},
                "y_hat": y_hat_b, "y_base": y_hat_b,
                "mu": jnp.concatenate(mus_b, axis=-1),
                "std": jnp.concatenate(scales_b, axis=-1),
            }

        if not self.all_scalable:
            prog_slices, prog_liks, mu_list, std_list, rng = \
                self._prog_slices_non_scalable(
                    y, quality, y_hat_slices, latent_means, latent_scales,
                    mask_policy, training, rng, checkpoint_ref,
                    mus_b, scales_b)
            y_hat_p = jnp.concatenate(prog_slices, axis=-1)
            x_hat = jnp.clip(self.synthesize_prog(y_hat_p), 0.0, 1.0)
            return {
                "x_hat": x_hat,
                "likelihoods": {
                    "y": jnp.concatenate([y_lik_base] + prog_liks, axis=-1),
                    "z": z_lik},
                "y_hat": y_hat_p, "y_base": y_hat_b, "y_prog": y_hat_p,
                "mu_base": jnp.concatenate(mus_b, axis=-1),
                "mu": jnp.concatenate(mu_list, axis=-1),
                "std_base": jnp.concatenate(scales_b, axis=-1),
                "std": jnp.concatenate(std_list, axis=-1),
            }

        mus, muts, scales, msups = self._prog_param_chain(
            y_hat_slices, latent_means, latent_scales)

        prog_slices, prog_liks, mu_list, std_list = [], [], [], []
        for i in range(self.ns1 - self.ns0):
            r_i = self._slice(y, self.ns0 + i)
            if self.delta_encode:
                r_i = r_i - self._slice(y, i)
            mu, scale = self._refine_prog_params(
                i, quality, mus[i], scales[i], checkpoint_ref,
                mus_b[i], scales_b[i])
            mask = apply_noise_mask(
                variance_mask(scale, quality, mask_policy), False)
            centered = (r_i - mu) * mask
            if training:
                rng, sub = jax.random.split(rng)
                noisy = centered + jax.random.uniform(
                    sub, centered.shape, centered.dtype, -0.5, 0.5)
            else:
                noisy = ste_round(centered)
            prog_liks.append(gaussian_likelihood(
                noisy, scale * mask, None, self.scale_bound))
            y_hat_i = ste_round(r_i - mu) * mask + mu
            y_hat_i = self.finish_prog_slice(y_hat_i, msups[i],
                                             y_hat_slices[i], i)
            prog_slices.append(y_hat_i)
            mu_list.append(mu)
            std_list.append(scale)

        y_hat_p = jnp.concatenate(prog_slices, axis=-1)
        x_hat = jnp.clip(self.synthesize_prog(y_hat_p), 0.0, 1.0)
        y_lik = jnp.concatenate([y_lik_base] + prog_liks, axis=-1)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
            "y_hat": y_hat_p, "y_base": y_hat_b, "y_prog": y_hat_p,
            "mu_base": jnp.concatenate(mus_b, axis=-1),
            "mu": jnp.concatenate(mu_list, axis=-1),
            "std_base": jnp.concatenate(scales_b, axis=-1),
            "std": jnp.concatenate(std_list, axis=-1),
        }

    def init_all(self, x):
        """Parameter-initialization entry: traces every submodule (linen
        creates params lazily, so plain __call__ would skip branches).
        Use: model.init(rngs, x, method='init_all')."""
        return self.__call__(x, [0, 10], training=False)

    def aux_loss(self):
        """Bottleneck quantile-fitting loss (reference: base.py:22-29
        sums EntropyBottleneck.loss() over modules; there is one)."""
        return self.entropy_bottleneck.aux_loss()

    def _define_quality(self, quality):
        if quality is None:
            return [0, 10]
        if isinstance(quality, (list, tuple)):
            return list(quality) if quality[0] == 0 else [0] + list(quality)
        return [quality]


def make_scale_table():
    return get_scale_table()


def pic_build_indexes(scales, scale_table, scale_bound: float = 0.11):
    return gc_build_indexes(scales, scale_table, scale_bound)

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
    StackedParamNet,
    SynthesisTransform,
    paramnet_apply,
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
    # express the slice chains as lax.scan over the stacked ParamNet
    # weights (one compiled body instead of ns0/nprog unrolled ones —
    # first-compile and init drop by ~an order of magnitude). False keeps
    # the unrolled chains (same stacked params, per-slice static indexing),
    # useful for A/B and for debugging.
    scan_chains: bool = True

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

    @property
    def _n_slots_base(self) -> int:
        """Fixed support-slot count of the base chain (slices beyond slot
        j's fill order see zeros there, matching the ragged reference)."""
        if self.max_support_slices < 0:
            return max(self.ns0 - 1, 0)
        return min(self.max_support_slices, max(self.ns0 - 1, 0))

    @property
    def _n_slots_prog(self) -> int:
        nprog = self.ns1 - self.ns0
        if self.support_progressive_slices <= 0:
            return 0
        return min(self.support_progressive_slices, max(nprog - 1, 0))

    @property
    def _in_base(self) -> int:
        return self.division[0] + self._n_slots_base * self.dim_chunk

    @property
    def _in_prog(self) -> int:
        dp = self.division[1] - self.division[0]
        return dp + self.dim_chunk + self._n_slots_prog * self.dim_chunk

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
        c = self.dim_chunk
        in_b, in_p = self._in_base, self._in_prog
        self.cc_mean = StackedParamNet(ns0, in_b, c, pw, dt,
                                       name="cc_mean")
        self.cc_scale = StackedParamNet(ns0, in_b, c, pw, dt,
                                        name="cc_scale")
        self.lrp = StackedParamNet(ns0, in_b + c, c, pw, dt, name="lrp")
        if nprog > 0:
            self.cc_mean_prog = StackedParamNet(nprog, in_p, c, pw, dt,
                                                name="cc_mean_prog")
            self.cc_scale_prog = StackedParamNet(nprog, in_p, c, pw, dt,
                                                 name="cc_scale_prog")
            self.lrp_prog = StackedParamNet(ns0, in_p + c, c, pw, dt,
                                            name="lrp_prog")
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

    def _zeros_like_support(self, ref, n_chunks: int):
        return jnp.zeros(ref.shape[:-1] + (n_chunks * self.dim_chunk,),
                         ref.dtype)

    def base_slice_params(self, latent_means, latent_scales,
                          support: List[jnp.ndarray], i: int):
        """Entropy params for base slice i given decoded support slices.

        latent_means/scales: base 320-ch hyper outputs. support: previous
        y_hat slices [:min(5, i)]. Returns (mu, scale, mean_support).
        The support block is padded with zero chunks to the fixed stacked
        width `_in_base` (zero inputs x zero-padded weight rows == the
        reference's ragged per-slice nets, pic.py:330-347).
        """
        # max_support_slices < 0 = use ALL decoded slices (reference:
        # pic.py:333-336)
        k = len(support) if self.max_support_slices < 0 else \
            min(self.max_support_slices, i)
        sup = list(support[:k])
        if k < self._n_slots_base:
            sup.append(self._zeros_like_support(latent_means,
                                                self._n_slots_base - k))
        mean_support = jnp.concatenate([latent_means] + sup, axis=-1)
        scale_support = jnp.concatenate([latent_scales] + sup, axis=-1)
        mu = self.cc_mean(mean_support, i)
        scale = self.cc_scale(scale_support, i)
        return mu, scale, mean_support

    def finish_base_slice(self, y_hat_raw, mean_support, i: int):
        """Apply the latent-residual-prediction refinement
        (reference: pic.py:358-361). y_hat_raw = dequantized slice."""
        lrp_in = jnp.concatenate([mean_support, y_hat_raw], axis=-1)
        return y_hat_raw + 0.5 * jnp.tanh(self.lrp(lrp_in, i))

    def base_slice_params_dyn(self, latent_means, latent_scales, buf, i):
        """Codec-side base slice params with a TRACED slice index.

        buf: [max(n_slots,1), B, h, w, c] support buffer (slot j = decoded
        slice j, zero when unfilled) — the same math as the scan body
        (_base_chain_scan), so ONE jitted program serves all ns0 slices of
        the codec's interleaved base chain instead of ns0 per-slice
        compilations (reference decompress walks per-slice Python modules,
        pic.py:869-903). Returns (mu, scale, mean_support)."""
        n, c = self._n_slots_base, self.dim_chunk
        dt = None if self.compute_dtype == "float32" else \
            jnp.dtype(self.compute_dtype)
        ck, cb = self.cc_mean.stacked()
        sk, sb = self.cc_scale.stacked()
        sup = jnp.moveaxis(buf[:n], 0, 3).reshape(
            latent_means.shape[:-1] + (n * c,))
        mean_support = jnp.concatenate([latent_means, sup], axis=-1)
        scale_support = jnp.concatenate([latent_scales, sup], axis=-1)
        mu = paramnet_apply(ck, cb, mean_support, i, dt)
        scale = paramnet_apply(sk, sb, scale_support, i, dt)
        return mu, scale, mean_support

    def finish_base_slice_dyn(self, y_hat_raw, mean_support, buf, i):
        """LRP refinement with a traced slice index + support-buffer
        update; pairs with base_slice_params_dyn. Returns (y_hat, buf)."""
        dt = None if self.compute_dtype == "float32" else \
            jnp.dtype(self.compute_dtype)
        lk, lb = self.lrp.stacked()
        lrp_in = jnp.concatenate([mean_support, y_hat_raw], axis=-1)
        y_hat = y_hat_raw + 0.5 * jnp.tanh(
            paramnet_apply(lk, lb, lrp_in, i, dt))
        n = self._n_slots_base
        if n > 0:
            upd = jax.lax.dynamic_update_index_in_dim(
                buf, y_hat, jnp.minimum(i, n - 1), 0)
            buf = jnp.where(i < n, upd, buf)
        return y_hat, buf

    def prog_slice_params(self, latent_means, latent_scales, y_hat_base_i,
                          mu_support: List[jnp.ndarray],
                          std_support: List[jnp.ndarray], i: int):
        """Entropy params for progressive slice i.

        latent_means/scales: enhancement 320-ch hyper outputs. Support =
        [base y_hat_i] + up to 5 previous mu_total / std_total tensors
        (all_scalable) or previous decoded prog slices; the slot block is
        front-padded with zero chunks to the fixed width (newest entries
        at the end — the shift-register layout the scan chain uses).
        Returns (mu, mu_total_entry, scale, mean_support).
        Reference: pic.py:396-427 and test/utils.py:35-55.
        """
        k = min(self.support_progressive_slices, i) \
            if self.support_progressive_slices > 0 else 0
        front = [] if k >= self._n_slots_prog else \
            [self._zeros_like_support(latent_means, self._n_slots_prog - k)]
        tail_mu = list(mu_support[len(mu_support) - k:]) if k > 0 else []
        tail_std = list(std_support[len(std_support) - k:]) if k > 0 else []
        mean_support = jnp.concatenate(
            [latent_means, y_hat_base_i] + front + tail_mu, axis=-1)
        scale_support = jnp.concatenate(
            [latent_scales, y_hat_base_i] + front + tail_std, axis=-1)
        mu = self.cc_mean_prog(mean_support, i)
        mut = mu + y_hat_base_i if self.total_mu_rep else mu
        scale = self.cc_scale_prog(scale_support, i)
        return mu, mut, scale, mean_support

    def finish_prog_slice(self, y_hat_raw, mean_support, y_hat_base_i,
                          i: int):
        """LRP + merge with the base slice (reference: pic.py:446-451)."""
        lrp_in = jnp.concatenate([mean_support, y_hat_raw], axis=-1)
        y_hat = y_hat_raw + 0.5 * jnp.tanh(self.lrp_prog(lrp_in, i))
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

    def _blocked(self, y, first: int, last: int):
        """Channel slices [first,last) as a stacked [S,B,h,w,c] array."""
        c = self.dim_chunk
        b, h, w = y.shape[0], y.shape[1], y.shape[2]
        blk = y[..., first * c:last * c].reshape(b, h, w, last - first, c)
        return jnp.moveaxis(blk, 3, 0)

    def _base_chain(self, y, latent_means, latent_scales,
                    training: bool, rng=None):
        """All 10 base slices (sequential by construction). Returns
        (y_hat_slices, likelihoods, mus, scales, mean_supports) — each a
        stacked [S,...] array (indexing/concatenating matches the former
        per-slice lists)."""
        lm = latent_means[..., :self.division[0]]
        ls = latent_scales[..., :self.division[0]]
        if self.scan_chains:
            return self._base_chain_scan(y, lm, ls, training, rng)
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
        return (jnp.stack(y_hat_slices), jnp.stack(liks), jnp.stack(mus),
                jnp.stack(scales), jnp.stack(msups), rng)

    def _base_chain_scan(self, y, lm, ls, training: bool, rng=None):
        """One lax.scan body for the whole base chain. The support buffer
        holds the FIRST `_n_slots_base` decoded slices (slot j = slice j,
        reference pic.py:333-336 takes support[:max_support]); unfilled
        slots stay zero, which the zero-padded stacked weights make exactly
        equivalent to the reference's ragged per-slice nets."""
        ns0, n, c = self.ns0, self._n_slots_base, self.dim_chunk
        dt = None if self.compute_dtype == "float32" else \
            jnp.dtype(self.compute_dtype)
        ck, cb = self.cc_mean.stacked()
        sk, sb = self.cc_scale.stacked()
        lk, lb = self.lrp.stacked()
        y_s = self._blocked(y, 0, ns0)
        if training:
            rng, sub = jax.random.split(rng)
            keys = jax.random.split(sub, ns0)
        else:
            keys = jnp.zeros((ns0,), jnp.uint32)  # unused placeholder
        buf0 = jnp.zeros((max(n, 1),) + y_s.shape[1:], jnp.float32)

        def body(buf, xs):
            i, y_i, key = xs
            sup = jnp.moveaxis(buf[:n], 0, 3).reshape(
                y_i.shape[:-1] + (n * c,))
            mean_support = jnp.concatenate([lm, sup], axis=-1)
            scale_support = jnp.concatenate([ls, sup], axis=-1)
            mu = paramnet_apply(ck, cb, mean_support, i, dt)
            scale = paramnet_apply(sk, sb, scale_support, i, dt)
            if training:
                noisy = y_i + jax.random.uniform(
                    key, y_i.shape, y_i.dtype, -0.5, 0.5)
            else:
                noisy = ste_round(y_i - mu) + mu
            lik = gaussian_likelihood(noisy, scale, mu, self.scale_bound)
            y_hat = ste_round(y_i - mu) + mu
            lrp_in = jnp.concatenate([mean_support, y_hat], axis=-1)
            y_hat = y_hat + 0.5 * jnp.tanh(
                paramnet_apply(lk, lb, lrp_in, i, dt))
            if n > 0:
                upd = jax.lax.dynamic_update_index_in_dim(
                    buf, y_hat, jnp.minimum(i, n - 1), 0)
                buf = jnp.where(i < n, upd, buf)
            return buf, (y_hat, lik, mu, scale, mean_support)

        idx = jnp.arange(ns0, dtype=jnp.int32)
        _, (y_hat_s, liks, mus, scales, msups) = jax.lax.scan(
            body, buf0, (idx, y_s, keys))
        return y_hat_s, liks, mus, scales, msups, rng

    def _prog_param_chain(self, y_hat_base_slices, latent_means,
                          latent_scales):
        """Quality-independent progressive entropy-parameter chain
        (all_scalable=True, the paper's configuration). Returns
        (mus, muts, scales, mean_supports) as stacked [S,...] arrays."""
        lm = latent_means[..., self.division[0]:]
        ls = latent_scales[..., self.division[0]:]
        if self.scan_chains:
            return self._prog_param_chain_scan(y_hat_base_slices, lm, ls)
        mus, muts, scales, msups = [], [], [], []
        for i in range(self.ns1 - self.ns0):
            mu, mut, scale, msup = self.prog_slice_params(
                lm, ls, y_hat_base_slices[i], muts, scales, i)
            mus.append(mu)
            muts.append(mut)
            scales.append(scale)
            msups.append(msup)
        return (jnp.stack(mus), jnp.stack(muts), jnp.stack(scales),
                jnp.stack(msups))

    def _prog_param_chain_scan(self, y_hat_base_slices, lm, ls):
        """Shift-register lax.scan over the progressive slices: the
        carry holds the last `_n_slots_prog` (mu_total, scale) tensors,
        newest at the end — exactly the front-zero-padded layout
        prog_slice_params builds for the ragged reference supports."""
        nprog = self.ns1 - self.ns0
        n, c = self._n_slots_prog, self.dim_chunk
        dt = None if self.compute_dtype == "float32" else \
            jnp.dtype(self.compute_dtype)
        ck, cb = self.cc_mean_prog.stacked()
        sk, sb = self.cc_scale_prog.stacked()
        base_s = (y_hat_base_slices if isinstance(y_hat_base_slices,
                                                  jnp.ndarray)
                  else jnp.stack(list(y_hat_base_slices)))[:nprog]
        shp = base_s.shape[1:]
        buf0 = (jnp.zeros((max(n, 1),) + shp, jnp.float32),
                jnp.zeros((max(n, 1),) + shp, jnp.float32))

        def body(carry, xs):
            mut_buf, std_buf = carry
            i, base_i = xs
            sup_mu = jnp.moveaxis(mut_buf[:n], 0, 3).reshape(
                base_i.shape[:-1] + (n * c,))
            sup_std = jnp.moveaxis(std_buf[:n], 0, 3).reshape(
                base_i.shape[:-1] + (n * c,))
            mean_support = jnp.concatenate([lm, base_i, sup_mu], axis=-1)
            scale_support = jnp.concatenate([ls, base_i, sup_std], axis=-1)
            mu = paramnet_apply(ck, cb, mean_support, i, dt)
            mut = mu + base_i if self.total_mu_rep else mu
            scale = paramnet_apply(sk, sb, scale_support, i, dt)
            if n > 0:
                mut_buf = jnp.concatenate([mut_buf[1:], mut[None]], axis=0)
                std_buf = jnp.concatenate([std_buf[1:], scale[None]],
                                          axis=0)
            return (mut_buf, std_buf), (mu, mut, scale, mean_support)

        idx = jnp.arange(nprog, dtype=jnp.int32)
        _, (mus, muts, scales, msups) = jax.lax.scan(
            body, buf0, (idx, base_s))
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
        nprog = self.ns1 - self.ns0
        r_s = self._blocked(y, self.ns0, self.ns1)
        if self.delta_encode:
            r_s = r_s - self._blocked(y, 0, nprog)
        if self.scan_chains:
            dt = None if self.compute_dtype == "float32" else \
                jnp.dtype(self.compute_dtype)
            lk, lb = self.lrp_prog.stacked()
            if training:
                rng, sub = jax.random.split(rng)
                keys = jax.random.split(sub, nprog)
            else:
                keys = jnp.zeros((nprog,), jnp.uint32)

            def body(_, xs):
                i, r_i, mu, scale, msup, base_i, key = xs
                mask = jnp.stack(
                    [apply_noise_mask(
                        variance_mask(scale, q, mask_policy), False)
                     for q in prog_qs])
                centered = (r_i - mu)[None] * mask
                if training:
                    noisy = centered + jax.random.uniform(
                        key, centered.shape, centered.dtype, -0.5, 0.5)
                else:
                    noisy = ste_round(centered)
                lik = gaussian_likelihood(
                    noisy, scale[None] * mask, None, self.scale_bound)
                y_hat_i = ste_round(r_i[None] - mu[None]) * mask + mu[None]
                flat = y_hat_i.reshape((L * b,) + y_hat_i.shape[2:])
                msup_rep = jnp.broadcast_to(
                    msup[None], (L,) + msup.shape
                ).reshape((L * b,) + msup.shape[1:])
                base_rep = jnp.broadcast_to(
                    base_i[None], (L,) + base_i.shape
                ).reshape((L * b,) + base_i.shape[1:])
                lrp_in = jnp.concatenate([msup_rep, flat], axis=-1)
                flat = flat + 0.5 * jnp.tanh(
                    paramnet_apply(lk, lb, lrp_in, i, dt))
                flat = flat + base_rep
                return _, (flat.reshape((L, b) + flat.shape[1:]), lik)

            idx = jnp.arange(nprog, dtype=jnp.int32)
            _, (y_hat_sl, lik_sl) = jax.lax.scan(
                body, 0, (idx, r_s, mus, scales, msups,
                          y_hat_slices[:nprog], keys))
            # [S,L,B,h,w,c] -> channel-concat the slices: [L,B,h,w,S*c]
            y_hat_prog_slices = list(y_hat_sl)
            prog_liks = list(lik_sl)
        else:
            y_hat_prog_slices = []  # each [L,B,h,w,32]
            prog_liks = []
            for i in range(nprog):
                r_i = r_s[i]
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

    def _refine_prog_params_all(self, quality, mus, scales,
                                checkpoint_ref, mus_b, scales_b):
        """Stacked-slice REM hook (identity here): refines every slice's
        (mu, scale) at once. Hoistable out of the chain because the
        all_scalable support consumes the UNREFINED params."""
        del quality, checkpoint_ref, mus_b, scales_b
        return mus, scales

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

        nprog = self.ns1 - self.ns0
        r_s = self._blocked(y, self.ns0, self.ns1)
        if self.delta_encode:
            r_s = r_s - self._blocked(y, 0, nprog)

        # REM refinement (identity in the base class) hoists out of the
        # chain: the all_scalable support uses the UNREFINED params
        # (rem_pic.py:560-581), so all slices refine in one stacked call.
        mus_f, scales_f = self._refine_prog_params_all(
            quality, mus, scales, checkpoint_ref, mus_b, scales_b)

        if self.scan_chains:
            dt = None if self.compute_dtype == "float32" else \
                jnp.dtype(self.compute_dtype)
            lk, lb = self.lrp_prog.stacked()
            if training:
                rng, sub = jax.random.split(rng)
                keys = jax.random.split(sub, nprog)
            else:
                keys = jnp.zeros((nprog,), jnp.uint32)

            def body(_, xs):
                i, r_i, mu, scale, msup, base_i, key = xs
                mask = apply_noise_mask(
                    variance_mask(scale, quality, mask_policy), False)
                centered = (r_i - mu) * mask
                if training:
                    noisy = centered + jax.random.uniform(
                        key, centered.shape, centered.dtype, -0.5, 0.5)
                else:
                    noisy = ste_round(centered)
                lik = gaussian_likelihood(
                    noisy, scale * mask, None, self.scale_bound)
                y_hat_i = ste_round(r_i - mu) * mask + mu
                lrp_in = jnp.concatenate([msup, y_hat_i], axis=-1)
                y_hat_i = y_hat_i + 0.5 * jnp.tanh(
                    paramnet_apply(lk, lb, lrp_in, i, dt)) + base_i
                return _, (y_hat_i, lik)

            idx = jnp.arange(nprog, dtype=jnp.int32)
            _, (y_hat_sl, lik_sl) = jax.lax.scan(
                body, 0, (idx, r_s, mus_f, scales_f, msups,
                          y_hat_slices[:nprog], keys))
            prog_slices = list(y_hat_sl)
            prog_liks = list(lik_sl)
            mu_list, std_list = list(mus_f), list(scales_f)
        else:
            prog_slices, prog_liks, mu_list, std_list = [], [], [], []
            for i in range(nprog):
                r_i = r_s[i]
                mu, scale = mus_f[i], scales_f[i]
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
        """Parameter-initialization entry: touches every submodule once
        (linen creates compact-module params lazily, so plain __call__
        would skip branches). Deliberately does NOT run the slice chains:
        the stacked heads create their params in setup(), so one cheap
        per-slice call covers shape validation and the init program stays
        small — flagship init compile drops from ~90s to seconds.
        Use: model.init(rngs, x, method='init_all')."""
        y = self.latent(x)
        z = self.h_a(y)
        self.entropy_bottleneck(z, False)
        z_hat = self.z_hat_ste(z)
        lm, ls = self.hyper_synthesis(z_hat)
        d0 = self.division[0]
        y_b = y[..., :d0]
        x_hat = self.synthesize_base(y_b)
        lm_b, ls_b = lm[..., :d0], ls[..., :d0]
        mu, scale, msup = self.base_slice_params(lm_b, ls_b, [], 0)
        self.finish_base_slice(mu, msup, 0)
        if self.ns1 > self.ns0:
            self.synthesize_prog(y_b)
            lm_e, ls_e = lm[..., d0:], ls[..., d0:]
            mu2, _, _, msup2 = self.prog_slice_params(
                lm_e, ls_e, mu, [], [], 0)
            self.finish_prog_slice(mu2, msup2, mu, 0)
        return {"x_hat": x_hat[None]}

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

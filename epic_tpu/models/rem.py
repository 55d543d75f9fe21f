"""VarianceMaskingPICREM — PIC + Rate Enhancement Modules.

Reference behavior: src/models/rem_pic.py. REMs refine the progressive
entropy parameters (mu, sigma) of each slice using an already-decoded
checkpoint-quality latent; one REM bank per quality bracket between the
``check_levels``. The support chain always consumes the UNREFINED
parameters (rem_pic.py:560-561 appends before enhancement); only the
per-slice masking/coding uses the refined ones.

TPU-native restructuring: each bank's per-slice LatentRateReduction
modules are stored STACKED (nn.vmap over the slice axis, params get a
leading [S] dim), so a whole bank refines all slices in ONE vmapped
program — and because the all_scalable support chain uses the unrefined
params, the refinement hoists cleanly out of the slice chain
(_refine_prog_params_all). Per-slice access (the interleaved non-scalable
codec and the chained single-bitstream path) slices the stacked weights
and applies the plain module functionally — the same weights either way.

The bracket selection is static for python-float qualities (the codec
path) and a lax.switch for traced qualities (sampling training).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import LatentRateReduction, apply_noise_mask, variance_mask
from ..ops.masking import prog_mask
from ..ops.rem import lrr_apply
from .builder import paramnet_apply
from .pic import VarianceMaskingPIC


class VarianceMaskingPICREM(VarianceMaskingPIC):
    check_levels: Sequence[float] = (0.01, 0.25, 1.75)
    mu_std: bool = True
    rem_dimension: str = "big"

    @property
    def num_rems(self) -> int:
        return len(self.check_levels)

    def setup(self):
        super().setup()
        stacked = nn.vmap(
            LatentRateReduction,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0, out_axes=0)
        self.post_latent = [
            stacked(self.dim_chunk, self.mu_std, self.rem_dimension,
                    name=f"post_latent_{r}")
            for r in range(self.num_rems)
        ]

    # ------------------------------------------------------------------

    def find_check_quality(self, quality: float):
        """Bracket a quality between checkpoint levels: returns
        (quality_ref, quality_post, rem_index). Reference:
        rem_pic.py:142-165 (generalized to any number of levels)."""
        c = list(self.check_levels)
        if quality <= c[0]:
            return 0.0, 0.0, -1
        for j in range(len(c) - 1):
            if c[j] < quality <= c[j + 1]:
                return c[j], c[j + 1], j
        return c[-1], 10.0, len(c) - 1

    def _rem_bank_index(self, quality: float) -> int:
        """Which REM refines at this quality (reference:
        rem_pic.py:200-214): bank j for c_j < q <= c_{j+1}, last bank
        above c_last."""
        c = list(self.check_levels)
        for j in range(len(c) - 1):
            if c[j] < quality <= c[j + 1]:
                return j
        return len(c) - 1

    def _bank_slice_apply(self, bank: int, i, x_base, params_base,
                          params_prog, att_mask):
        """Apply ONE slice of a stacked bank: slice the [S,...]-stacked
        weights at i (static int or traced int32) and run the plain
        LatentRateReduction functionally. Used by the per-slice codec
        paths; identical weights to the vmapped whole-bank call."""
        stacked = self.post_latent[bank].variables["params"]
        if isinstance(i, int):
            sub = jax.tree.map(lambda a: a[i], stacked)
        else:
            sub = jax.tree.map(lambda a: jnp.take(a, i, axis=0), stacked)
        return lrr_apply(sub, x_base, params_base, params_prog, att_mask)

    def apply_latent_enhancement(self, current_index: int, quality,
                                 y_b_hat, params_base, params_prog,
                                 mu, scale, attention_mask=None,
                                 training: bool = False):
        """Run the right REM on one slice (reference: rem_pic.py:167-220).
        quality must be a static python float here; traced qualities go
        through _refine_prog_params."""
        if attention_mask is None:
            attention_mask = apply_noise_mask(
                variance_mask(scale, quality, self.mask_policy), training)
        if self.mu_std:
            attention_mask = jnp.concatenate(
                [attention_mask, attention_mask], axis=-1)
        if quality <= self.check_levels[0]:
            return mu, scale
        bank = self._rem_bank_index(quality)
        out = self._bank_slice_apply(bank, current_index, y_b_hat,
                                     params_base, params_prog,
                                     attention_mask)
        if self.mu_std:
            mu, scale = jnp.split(out, 2, axis=-1)
            return mu, scale
        return mu, out

    def _refine_prog_params(self, i: int, quality, mu, scale,
                            checkpoint_ref, mu_base_i, std_base_i):
        if checkpoint_ref is None:
            return mu, scale
        y_b_hat = self._slice(checkpoint_ref, i)
        params_base = jnp.concatenate([mu_base_i, std_base_i], axis=-1)
        params_prog = (jnp.concatenate([mu, scale], axis=-1)
                       if self.mu_std else scale)

        if isinstance(quality, (int, float)):
            return self.apply_latent_enhancement(
                i, float(quality), y_b_hat, params_base, params_prog,
                mu, scale)

        # traced quality: attention mask + bank switch under jit
        att = apply_noise_mask(
            variance_mask(scale, quality, self.mask_policy), False)
        if self.mu_std:
            att = jnp.concatenate([att, att], axis=-1)
        c = jnp.asarray(list(self.check_levels), jnp.float32)
        bank = jnp.clip(jnp.sum(quality > c) - 1, 0, self.num_rems - 1)

        def make_branch(j):
            def branch(_):
                return self._bank_slice_apply(j, i, y_b_hat, params_base,
                                              params_prog, att)
            return branch

        out = jax.lax.switch(bank, [make_branch(j)
                                    for j in range(self.num_rems)], None)
        if self.mu_std:
            mu_r, scale_r = jnp.split(out, 2, axis=-1)
        else:
            mu_r, scale_r = mu, out
        # below the first checkpoint the REMs do not apply
        skip = quality <= self.check_levels[0]
        return (jnp.where(skip, mu, mu_r), jnp.where(skip, scale, scale_r))

    def _refine_prog_params_all(self, quality, mus, scales,
                                checkpoint_ref, mus_b, scales_b):
        """Refine ALL progressive slices in one vmapped bank call.

        mus/scales: stacked [S,B,h,w,c] unrefined chain outputs;
        mus_b/scales_b: stacked base-slice params. Valid because the
        all_scalable support chain consumes the UNREFINED params
        (rem_pic.py:560-581) — the refinement has no sequential
        dependency and hoists out of the chain."""
        if checkpoint_ref is None:
            return mus, scales
        nprog = self.ns1 - self.ns0
        ckpt_s = self._blocked(checkpoint_ref, 0, nprog)
        params_base = jnp.concatenate([mus_b[:nprog], scales_b[:nprog]],
                                      axis=-1)
        params_prog = (jnp.concatenate([mus, scales], axis=-1)
                       if self.mu_std else scales)
        att = apply_noise_mask(
            prog_mask(scales, quality, self.mask_policy), False)
        if self.mu_std:
            att = jnp.concatenate([att, att], axis=-1)

        static_q = isinstance(quality, (int, float))
        if static_q and quality <= self.check_levels[0]:
            return mus, scales
        if static_q:
            bank = self._rem_bank_index(float(quality))
            out = self.post_latent[bank](ckpt_s, params_base, params_prog,
                                         att)
        else:
            c = jnp.asarray(list(self.check_levels), jnp.float32)
            bank = jnp.clip(jnp.sum(quality > c) - 1, 0, self.num_rems - 1)
            out = jax.lax.switch(
                bank,
                [(lambda j: lambda _: self.post_latent[j](
                    ckpt_s, params_base, params_prog, att))(j)
                 for j in range(self.num_rems)], None)
        if self.mu_std:
            mu_r, scale_r = jnp.split(out, 2, axis=-1)
        else:
            mu_r, scale_r = mus, out
        if static_q:
            return mu_r, scale_r
        skip = quality <= self.check_levels[0]
        return (jnp.where(skip, mus, mu_r),
                jnp.where(skip, scales, scale_r))

    def _rem_chain_params(self, y_hat_base_slices, latent_means,
                          latent_scales, ckpts, mu_b, std_b):
        """Chained-REM progressive params for the single-bitstream codec,
        as ONE lax.scan over the slices (the unrolled form compiles
        (ns1-ns0) x n_checkpoints module applies into one giant program —
        the dominant cold-start cost with REMs on).

        Reference semantics (functions_encode.py:127-148 /
        functions_decode.py:135-151): checkpoint j refines (mu, scale)
        with the bank selected by q=check_levels[j], conditioned on
        checkpoint j's decoded latent; j=0 is a structural NO-OP because
        apply_latent_enhancement returns early for
        quality <= check_levels[0] (rem_pic.py:196-198). The support
        chains off the REFINED scale and the unrefined mu_total (the
        reference appends after enhancement on both sides — consistent
        between encoder and decoder).

        Returns (mus, scales, mean_supports) stacked [S,...].
        """
        n_ck = len(ckpts)
        if n_ck <= 1:
            # single checkpoint: the j=0 refinement is a no-op, so the
            # plain quality-independent chain is bitwise identical (and
            # already a scan)
            mus, _, scales, msups = self._prog_param_chain(
                y_hat_base_slices, latent_means, latent_scales)
            return mus, scales, msups

        lm_e = latent_means[..., self.division[0]:]
        ls_e = latent_scales[..., self.division[0]:]
        nprog = self.ns1 - self.ns0
        n, c = self._n_slots_prog, self.dim_chunk
        dt = None if self.compute_dtype == "float32" else \
            jnp.dtype(self.compute_dtype)
        ck, cb = self.cc_mean_prog.stacked()
        sk, sb = self.cc_scale_prog.stacked()
        base_s = (y_hat_base_slices
                  if isinstance(y_hat_base_slices, jnp.ndarray)
                  else jnp.stack(list(y_hat_base_slices)))[:nprog]
        ckpt_s = jnp.stack([self._blocked(jnp.asarray(ckpt), 0, nprog)
                            for ckpt in ckpts], axis=1)  # [S,n_ck,B,h,w,c]
        mu_b_s = (mu_b if isinstance(mu_b, jnp.ndarray)
                  else jnp.stack(list(mu_b)))[:nprog]
        std_b_s = (std_b if isinstance(std_b, jnp.ndarray)
                   else jnp.stack(list(std_b)))[:nprog]
        check_levels = list(self.check_levels)
        shp = base_s.shape[1:]
        buf0 = (jnp.zeros((max(n, 1),) + shp, jnp.float32),
                jnp.zeros((max(n, 1),) + shp, jnp.float32))

        def body(carry, xs):
            mut_buf, std_buf = carry
            i, base_i, ckpt_i, mu_b_i, std_b_i = xs
            sup_mu = jnp.moveaxis(mut_buf[:n], 0, 3).reshape(
                base_i.shape[:-1] + (n * c,))
            sup_std = jnp.moveaxis(std_buf[:n], 0, 3).reshape(
                base_i.shape[:-1] + (n * c,))
            mean_support = jnp.concatenate([lm_e, base_i, sup_mu], axis=-1)
            scale_support = jnp.concatenate([ls_e, base_i, sup_std],
                                            axis=-1)
            mu = paramnet_apply(ck, cb, mean_support, i, dt)
            mut = mu + base_i if self.total_mu_rep else mu
            scale = paramnet_apply(sk, sb, scale_support, i, dt)
            params_base = jnp.concatenate([mu_b_i, std_b_i], axis=-1)
            for j in range(1, n_ck):  # j=0: no-op (see docstring)
                q_j = float(check_levels[j])
                att = apply_noise_mask(
                    variance_mask(scale, q_j, self.mask_policy), False)
                if self.mu_std:
                    att = jnp.concatenate([att, att], axis=-1)
                params_prog = (jnp.concatenate([mu, scale], axis=-1)
                               if self.mu_std else scale)
                bank = self._rem_bank_index(q_j)
                out = self._bank_slice_apply(bank, i, ckpt_i[j],
                                             params_base, params_prog, att)
                if self.mu_std:
                    mu, scale = jnp.split(out, 2, axis=-1)
                else:
                    scale = out
            if n > 0:
                mut_buf = jnp.concatenate([mut_buf[1:], mut[None]], axis=0)
                std_buf = jnp.concatenate([std_buf[1:], scale[None]],
                                          axis=0)
            return (mut_buf, std_buf), (mu, scale, mean_support)

        idx = jnp.arange(nprog, dtype=jnp.int32)
        _, (mus, scales, msups) = jax.lax.scan(
            body, buf0, (idx, base_s, ckpt_s, mu_b_s, std_b_s))
        return mus, scales, msups

    # REM forward is single-quality (reference overrides forward with the
    # single-quality signature, rem_pic.py:226-229)
    def __call__(self, x, quality=0.0, training: bool = True,
                 mask_policy: Optional[str] = None, checkpoint_ref=None):
        return self.forward_single_quality(
            x, quality, training, mask_policy, checkpoint_ref)

    def init_all(self, x):
        """Touch every submodule incl. all REM banks (for model.init)."""
        out = super().init_all(x)
        b = x.shape[0]
        h, w = x.shape[1] // 16, x.shape[2] // 16
        c = self.dim_chunk
        s = self.ns0
        y_dummy = jnp.zeros((s, b, h, w, c))
        pb_dummy = jnp.zeros((s, b, h, w, 2 * c))
        pp_dummy = jnp.zeros((s, b, h, w, 2 * c if self.mu_std else c))
        att_dummy = jnp.ones_like(pp_dummy)
        for r in range(self.num_rems):
            self.post_latent[r](y_dummy, pb_dummy, pp_dummy, att_dummy)
        return out

"""WACNN — the window-attention channel-autoregressive baseline.

Standalone single-quality model matching the reference's ``cnn.py``
(src/models/cnn.py:26-281): the STF/ELIC-style transform pair with two
window-attention blocks per side, a 10-slice channel-conditional entropy
model over M=320, and latent-residual prediction — i.e. exactly the base
half of VarianceMaskingPIC with single (non-branched) encoder/decoder/
hyperprior. It is therefore implemented as a subclass that pins that
configuration and exposes the reference's single-quality surface:

- ``forward(x)``       → ``{"x_hat": [B,H,W,3], "likelihoods": {y,z}}``
  (reference cnn.py:135-188 return contract; the progressive stack axis
  of the PIC forward is removed because WACNN has exactly one quality).
- ``compress``/``decompress`` live on :class:`~epic_tpu.codec.PICCodec`
  (reference cnn.py:244-281): with a WACNN model the codec's buffered
  single-stream path produces one y-message + one z-message per image,
  the BufferedRansEncoder semantics of the reference. ``update()``
  (CDF-table rebuild, reference base class) is likewise the codec's
  constructor — tables are rebuilt from the current params every time,
  so there is no stale-buffer resize path to manage.

Layer-for-layer parity at the defaults (verified against cnn.py:34-133):
g_a/g_s k5s2 conv+GDN stacks with window-8/4 attention, h_a
320-288-256-224-N, h_mean_s/h_scale_s N-first 320-out, entropy heads
224-176-128-64-32 over 320+32*min(i,5) supports, lrp over min(i+1,6)
chunks.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .pic import VarianceMaskingPIC


class WACNN(VarianceMaskingPIC):
    """Single-quality WACNN (reference src/models/cnn.py:26-281).

    ``division`` always equals ``(m, m)`` — every channel is a base
    channel and there is no progressive stage — and the transform/
    hyperprior branches are single. Those fields are pinned in
    ``__post_init__`` so a caller (or a checkpoint config) cannot build
    an inconsistent WACNN; pass ``m`` to scale the model.
    """

    m: int = 320
    multiple_encoder: bool = False
    multiple_decoder: bool = False
    multiple_hyperprior: bool = False

    def __post_init__(self):
        # Pin the single-quality geometry regardless of caller input:
        # division tracks m, branches stay single (cnn.py has one g_a).
        object.__setattr__(self, "division", (self.m, self.m))
        object.__setattr__(self, "multiple_encoder", False)
        object.__setattr__(self, "multiple_decoder", False)
        object.__setattr__(self, "multiple_hyperprior", False)
        super().__post_init__()

    def forward(self, x, training: bool = True):
        """Reference cnn.py:135-188 forward contract: single x_hat.

        The inherited multi-quality ``__call__`` (which the trainer and
        codec use) already collapses to the base-only path for this
        geometry; this method strips its leading quality axis so the
        output matches the reference's ``{"x_hat": [B,H,W,3],
        "likelihoods": {"y", "z"}}`` shape.
        """
        out = self(x, None, training)
        return {"x_hat": out["x_hat"][0],
                "likelihoods": out["likelihoods"],
                "y_base": out["y_base"]}

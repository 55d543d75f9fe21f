"""Model registry (reference: src/models/__init__.py:5-55).

"cnn"  — WACNN: the STF channel-autoregressive single-quality baseline
         (reference cnn.py). Structurally the base half of the PIC model
         with single encoder/decoder/hyperprior and M=320, so it is
         expressed as a configuration of VarianceMaskingPIC.
"pic"  — VarianceMaskingPIC: the paper's progressive model.
"rem"  — VarianceMaskingPICREM: PIC + Rate Enhancement Modules.
"""

from __future__ import annotations

from typing import Any, Dict

from .pic import VarianceMaskingPIC
from .rem import VarianceMaskingPICREM


def wacnn(n: int = 192, m: int = 320, **kwargs) -> VarianceMaskingPIC:
    """WACNN baseline (reference cnn.py:26-133): single g_a/g_s/h_a/h_s,
    10 slices over M=320, no progressive stage. Layer-for-layer parity
    with the reference at the defaults (verified against cnn.py:34-133):
    g_a/g_s k5s2 conv+GDN stacks with window-8/4 attention, h_a
    320-288-256-224-N, h_mean_s/h_scale_s N-first 320-out, entropy heads
    224-176-128-64-32 over 320+32*min(i,5) supports (lrp min(i+1,6)).
    By construction division == (m, m), so a caller-supplied division (or
    branch-multiplicity flag) is ignored rather than an error — generic
    config plumbing (demo --tiny, checkpoint configs) can pass the PIC
    fields."""
    kwargs.setdefault("param_net_widths", (224, 176, 128, 64))
    for k in ("division", "multiple_encoder", "multiple_decoder",
              "multiple_hyperprior"):
        kwargs.pop(k, None)
    return VarianceMaskingPIC(
        n=n, m=m, division=(m, m),
        multiple_encoder=False, multiple_decoder=False,
        multiple_hyperprior=False, **kwargs)


def pic(**kwargs) -> VarianceMaskingPIC:
    return VarianceMaskingPIC(**kwargs)


def rem(**kwargs) -> VarianceMaskingPICREM:
    return VarianceMaskingPICREM(**kwargs)


MODELS = {"cnn": wacnn, "pic": pic, "rem": rem}


def get_model(name: str, **config: Any):
    """Build a model by registry name with config overrides."""
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; available: {list(MODELS)}")
    return MODELS[name](**config)


__all__ = ["VarianceMaskingPIC", "VarianceMaskingPICREM", "get_model",
           "MODELS", "wacnn", "pic", "rem"]

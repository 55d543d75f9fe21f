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
    10 slices over M=320, no progressive stage."""
    kwargs.setdefault("param_net_widths", (224, 176, 128, 64))
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

"""Model registry (reference: src/models/__init__.py:5-55).

"cnn"  — WACNN: the STF channel-autoregressive single-quality baseline
         (reference cnn.py). A standalone subclass (models/cnn.py) that
         pins the base half of the PIC model — single encoder/decoder/
         hyperprior, division == (m, m) — and adds the reference's
         single-quality forward contract.
"pic"  — VarianceMaskingPIC: the paper's progressive model.
"rem"  — VarianceMaskingPICREM: PIC + Rate Enhancement Modules.
"""

from __future__ import annotations

from typing import Any, Dict

from .cnn import WACNN
from .pic import VarianceMaskingPIC
from .rem import VarianceMaskingPICREM


def wacnn(n: int = 192, m: int = 320, **kwargs) -> WACNN:
    """WACNN baseline — see :class:`epic_tpu.models.cnn.WACNN` for the
    layer-for-layer parity note (reference cnn.py:26-281). The class pins
    division == (m, m) and single branches itself, so a caller-supplied
    division (or branch-multiplicity flag) is overridden rather than an
    error — generic config plumbing (demo --tiny, checkpoint configs) can
    pass the PIC fields."""
    kwargs.setdefault("param_net_widths", (224, 176, 128, 64))
    for k in ("division", "multiple_encoder", "multiple_decoder",
              "multiple_hyperprior"):
        kwargs.pop(k, None)
    return WACNN(n=n, m=m, **kwargs)


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


__all__ = ["VarianceMaskingPIC", "VarianceMaskingPICREM", "WACNN",
           "get_model", "MODELS", "wacnn", "pic", "rem"]

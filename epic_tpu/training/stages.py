"""The 4-stage training curriculum and parameter freezing.

Reference behavior: src/train.py:132-186 (criteria + quality grids +
lambda schedule) and the freeze/unfreeze methods (pic.py:167-195,
rem_pic.py:60-64). Freezing is realized TPU-style as an optax mask over the
parameter tree rather than requires_grad mutation.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

STAGES = ("first_train", "refine_gs", "refine_gs_ga", "rems")


@dataclasses.dataclass
class StagePlan:
    name: str
    criterion: str                       # key into losses.CRITERIA
    list_quality: List[float]
    sampling: bool                       # one random quality per batch
    lmbda_schedule: Optional[np.ndarray]  # per-quality lambda (refine_gs_ga)
    lmbda_list: Sequence[float]
    rems: Optional[Sequence[float]]      # checkpoint levels when training REMs
    unfreeze_lrp: bool = False


def _refine_quality_grid() -> List[float]:
    """~250-point grid: dense in [0.015, 1.5], sparse to 10
    (reference: train.py:153-155)."""
    part1 = list(np.arange(0.015, 1.5, (1.5 - 0.025) / 200)) + [1.5]
    part2 = list(np.arange(1.6, 10, (10 - 1.6) / 50)) + [10]
    return [float(q) for q in part1 + part2]


def _rems_quality_grid(check_levels: Sequence[float],
                       check_levels_np: Sequence[int]) -> List[float]:
    """Per-bracket grids between checkpoint levels
    (reference: train.py:167-184)."""
    qs: List[float] = []
    levels = list(check_levels) + [10]
    for i in range(len(levels) - 1):
        cur, nxt = levels[i], levels[i + 1]
        start = cur + 0.01 if i == 0 else cur
        step = (nxt - cur) / check_levels_np[i]
        qs.extend(np.arange(start, nxt, step))
    qs = [round(float(x), 4) for x in qs]
    if 10 not in qs:
        qs.append(10.0)
    return qs


def make_stage(training_type: str,
               lmbda_list: Sequence[float] = (0.0055, 0.04),
               check_levels: Sequence[float] = (0.75,),
               check_levels_np: Sequence[int] = (24,),
               unfreeze_lrp: bool = False) -> StagePlan:
    if training_type == "first_train":
        return StagePlan("first_train", "first_train", [0, 10], False,
                         None, lmbda_list, None)
    if training_type == "refine_gs":
        return StagePlan("refine_gs", "refine_gs", _refine_quality_grid(),
                         True, None, lmbda_list, None,
                         unfreeze_lrp=unfreeze_lrp)
    if training_type == "refine_gs_ga":
        qs = _refine_quality_grid()
        sched = np.logspace(np.log10(lmbda_list[0]), np.log10(lmbda_list[-1]),
                            len(qs) + 1)[1:]
        return StagePlan("refine_gs_ga", "refine_gs_ga", qs, True, sched,
                         lmbda_list, None)
    if training_type == "rems":
        qs = _rems_quality_grid(check_levels, check_levels_np)
        return StagePlan("rems", "rems", qs, True, None, lmbda_list,
                         list(check_levels))
    raise ValueError(f"unknown training_type {training_type!r}")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def trainable_mask(params, stage: str, unfreeze_lrp: bool = False,
                   multiple_decoder: bool = True,
                   multiple_encoder: bool = True):
    """Boolean pytree: which params the main optimizer updates.

    first_train: everything except the bottleneck quantiles (those belong
    to the aux optimizer; reference utility/functions.py:30-44).
    refine_gs: only g_s[1] (+ lrp_prog when requested).
    refine_gs_ga: g_s[1] + g_a[1].
    rems: only post_latent.
    """
    import jax

    def pred(path, _):
        name = _path_str(path)
        if "quantiles" in name:
            return False
        if stage == "first_train":
            return True
        if stage == "refine_gs":
            dec = "g_s_1" if multiple_decoder else "g_s"
            ok = name.startswith(dec)
            if unfreeze_lrp:
                ok = ok or name.startswith("lrp_prog")
            return ok
        if stage == "refine_gs_ga":
            dec = "g_s_1" if multiple_decoder else "g_s"
            enc = "g_a_1" if multiple_encoder else "g_a"
            return name.startswith(dec) or name.startswith(enc)
        if stage == "rems":
            return name.startswith("post_latent")
        raise ValueError(stage)

    return jax.tree_util.tree_map_with_path(pred, params)


def quantiles_mask(params):
    """Aux-optimizer mask: only the bottleneck quantiles. NOTE: the
    reference never actually steps its aux optimizer due to a typo
    ('first_strain', utility/functions.py:56); we train the quantiles
    properly — a documented, strictly-beneficial divergence."""
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda p, _: "quantiles" in _path_str(p), params)

"""Published Kodak RD anchor curves for comparison plots.

Data (benchmark numbers published with the reference, stored as JSON in
anchors.json): the paper model's Kodak curve plus the two tri-planet
competitor curves the reference plots against
(reference: src/utility/comparison.py, src/train.py:337-338).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List


@lru_cache(maxsize=1)
def load_anchors() -> Dict[str, Dict[str, List[float]]]:
    path = os.path.join(os.path.dirname(__file__), "anchors.json")
    with open(path) as f:
        return json.load(f)


def anchor(name: str):
    """-> (bpp list, psnr list). Names: reference_pic, tri_planet_23,
    tri_planet_22, train_fallback_base."""
    a = load_anchors()[name]
    return a["bpp"], a["psnr"]

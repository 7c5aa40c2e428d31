"""Stage checkpointing (SURVEY.md §5 "Checkpoint / resume").

The reference keeps intermediates only in heap buffers and writes final
PNGs.  Here every stage artifact (cost volume, aggregated volume, raw /
filtered disparity, masks) can be saved as ``.npy`` and any stage re-entered
from disk — reruns after a failure restart from the last saved stage instead
of from the images.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from stereo_match_traditional_tpu.models.base import StereoResult

_MANIFEST = "manifest.json"


def save_array(directory: str, name: str, arr) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.npy")
    np.save(path, np.asarray(arr))
    return path


def load_array(directory: str, name: str) -> np.ndarray:
    return np.load(os.path.join(directory, f"{name}.npy"))


def has_stage(directory: str, name: str) -> bool:
    return os.path.exists(os.path.join(directory, f"{name}.npy"))


def save_result(directory: str, result: StereoResult, meta: Optional[Dict] = None) -> None:
    """Persist every populated StereoResult field plus a manifest."""
    os.makedirs(directory, exist_ok=True)
    fields = {}
    for name in result._fields:
        val = getattr(result, name)
        if val is not None:
            save_array(directory, name, val)
            fields[name] = f"{name}.npy"
    with open(os.path.join(directory, _MANIFEST), "w") as f:
        json.dump({"fields": fields, "meta": meta or {}}, f, indent=2)


def load_result(directory: str) -> StereoResult:
    with open(os.path.join(directory, _MANIFEST)) as f:
        manifest = json.load(f)
    kwargs = {
        name: np.load(os.path.join(directory, fname))
        for name, fname in manifest["fields"].items()
    }
    return StereoResult(**kwargs)

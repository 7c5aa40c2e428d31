"""Pipeline registry — the framework's "model zoo"."""

from __future__ import annotations

from typing import Callable, Dict, Tuple, Type

from stereo_match_traditional_tpu import config as _cfg
from stereo_match_traditional_tpu.models.ad_census import ad_census_pipeline
from stereo_match_traditional_tpu.models.asw import asw_pipeline
from stereo_match_traditional_tpu.models.cblsm import cblsm_pipeline
from stereo_match_traditional_tpu.models.ncc import ncc_pipeline
from stereo_match_traditional_tpu.models.sad import sad_pipeline

PIPELINES: Dict[str, Tuple[Callable, Type]] = {
    "sad": (sad_pipeline, _cfg.SADConfig),
    "ncc": (ncc_pipeline, _cfg.NCCConfig),
    "asw": (asw_pipeline, _cfg.ASWConfig),
    "ad_census": (ad_census_pipeline, _cfg.ADCensusConfig),
    "cblsm": (cblsm_pipeline, _cfg.CBLSMConfig),
}


def get_pipeline(name: str):
    if name not in PIPELINES:
        raise KeyError(f"unknown pipeline {name!r}; have {sorted(PIPELINES)}")
    return PIPELINES[name]

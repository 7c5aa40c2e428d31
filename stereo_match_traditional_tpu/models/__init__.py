from stereo_match_traditional_tpu.models.base import StereoResult  # noqa: F401
from stereo_match_traditional_tpu.models.registry import PIPELINES, get_pipeline  # noqa: F401
from stereo_match_traditional_tpu.models.sad import sad_pipeline  # noqa: F401
from stereo_match_traditional_tpu.models.ncc import ncc_pipeline  # noqa: F401
from stereo_match_traditional_tpu.models.asw import asw_pipeline  # noqa: F401
from stereo_match_traditional_tpu.models.ad_census import ad_census_pipeline  # noqa: F401
from stereo_match_traditional_tpu.models.cblsm import cblsm_pipeline  # noqa: F401

from bayesssm_tpu.filters.core import particle_filter_core, FilterResult
from bayesssm_tpu.filters.bootstrap import bootstrap_filter
from bayesssm_tpu.filters.auxiliary import auxiliary_filter
from bayesssm_tpu.filters.resample_move import resample_move_filter

__all__ = [
    "particle_filter_core",
    "FilterResult",
    "bootstrap_filter",
    "auxiliary_filter",
    "resample_move_filter",
]

from bayesssm_tpu.pmmh.transforms import (
    transform_params,
    back_transform_params,
    log_jacobian,
    resolve_transforms,
)
from bayesssm_tpu.pmmh.tuning import default_tune_control, TuneControl
from bayesssm_tpu.pmmh.driver import pmmh

__all__ = [
    "transform_params",
    "back_transform_params",
    "log_jacobian",
    "resolve_transforms",
    "default_tune_control",
    "TuneControl",
    "pmmh",
]

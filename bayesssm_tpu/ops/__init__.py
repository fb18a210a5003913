from bayesssm_tpu.ops.weights import (
    normalize_log_weights,
    effective_sample_size,
    log_mean_exp,
)
from bayesssm_tpu.ops.resampling import (
    resample_indices,
    resample_multinomial,
    resample_stratified,
    resample_systematic,
    gather_particles,
)

__all__ = [
    "normalize_log_weights",
    "effective_sample_size",
    "log_mean_exp",
    "resample_indices",
    "resample_multinomial",
    "resample_stratified",
    "resample_systematic",
    "gather_particles",
]

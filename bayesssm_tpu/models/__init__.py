from bayesssm_tpu.models import distributions
from bayesssm_tpu.models.sinusoidal import (
    simulate_sinusoidal,
    sinusoidal_model,
    sinusoidal_sweep_pf_impl,
)
from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.models.sir import (
    simulate_sir,
    sir_builder_pf_impl,
    sir_model,
    sir_sweep_pf_impl,
)
from bayesssm_tpu.models.stochastic_volatility import sv_model, simulate_sv

__all__ = [
    "distributions",
    "sinusoidal_model",
    "simulate_sinusoidal",
    "sinusoidal_sweep_pf_impl",
    "lgss_model",
    "simulate_lgss",
    "sir_model",
    "simulate_sir",
    "sir_builder_pf_impl",
    "sir_sweep_pf_impl",
    "sv_model",
    "simulate_sv",
]

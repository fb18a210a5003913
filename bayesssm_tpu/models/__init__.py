from bayesssm_tpu.models import distributions
from bayesssm_tpu.models.sinusoidal import sinusoidal_model, simulate_sinusoidal
from bayesssm_tpu.models.lgss import lgss_model, simulate_lgss
from bayesssm_tpu.models.sir import sir_model, simulate_sir
from bayesssm_tpu.models.stochastic_volatility import sv_model, simulate_sv

__all__ = [
    "distributions",
    "sinusoidal_model",
    "simulate_sinusoidal",
    "lgss_model",
    "simulate_lgss",
    "sir_model",
    "simulate_sir",
    "sv_model",
    "simulate_sv",
]

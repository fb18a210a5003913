from bayesssm_tpu.diagnostics.ess import ess, ess_matrix
from bayesssm_tpu.diagnostics.rhat import rhat, rhat_matrix

__all__ = ["ess", "ess_matrix", "rhat", "rhat_matrix"]

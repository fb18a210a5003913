from bayesssm_tpu.utils.signatures import adapt_fn, check_params_match

__all__ = ["adapt_fn", "check_params_match"]

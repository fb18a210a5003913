"""User-function signature adaptation and validation.

The reference lets users write model functions that declare only the
arguments they use — R injects ``...`` and ``t`` formals at call time
(/root/reference/R/utils.R:82-87, R/particle_filter_core.R:52-67) and
validates names up front (/root/reference/R/utils.R:15-72). The Python
analogue inspects signatures once, outside the traced region, and builds a
keyword-filtering adapter, so a user can write e.g.::

    def transition_fn(particles, key, phi, sigma_x):
        return phi * particles + jnp.sin(particles) + sigma_x * normal(key)

and the engine can call it uniformly with the full keyword set
``(particles, key, t, **theta)``.
"""

from __future__ import annotations

import inspect

__all__ = ["adapt_fn", "adapt_move_fn", "check_params_match", "fn_param_names"]

# Engine-supplied argument names, never model parameters. Mirrors the drop
# list in /root/reference/R/utils.R:60.
ENGINE_ARGS = frozenset({"num_particles", "particles", "particle", "y", "t", "key"})


def fn_param_names(fn) -> tuple[set, bool]:
    """Names of explicit params, and whether the fn has a **kwargs catch-all."""
    sig = inspect.signature(fn)
    names = set()
    has_var_kw = False
    for p in sig.parameters.values():
        if p.kind == inspect.Parameter.VAR_KEYWORD:
            has_var_kw = True
        elif p.kind == inspect.Parameter.VAR_POSITIONAL:
            continue
        else:
            names.add(p.name)
    return names, has_var_kw


def adapt_fn(fn, fn_name: str, required: tuple = ()):
    """Wrap ``fn`` so it can be called with the engine's full keyword set.

    Keywords the user's signature does not declare are dropped (unless the
    fn has ``**kwargs``). ``required`` argument names must be declared,
    mirroring the reference's errors
    (/root/reference/R/utils.R:23-51, e.g. "init_fn does not contain
    'num_particles' as an argument").
    """
    names, has_var_kw = fn_param_names(fn)
    for req in required:
        if req not in names and not has_var_kw:
            raise ValueError(
                f"{fn_name} does not contain '{req}' as an argument"
            )
    if has_var_kw:
        return fn

    def adapted(**kwargs):
        return fn(**{k: v for k, v in kwargs.items() if k in names})

    adapted.__name__ = getattr(fn, "__name__", fn_name)
    return adapted


def adapt_move_fn(move_fn):
    """Adapt a RMPF rejuvenation move for the vectorized engine.

    The reference calls ``move_fn(particle = particles[j, ], ...)`` once per
    particle (/root/reference/R/particle_filter_core.R:226-234), so a
    reference-style move function declares ``particle`` (singular). Such a
    function is auto-vmapped here: each particle gets its own PRNG subkey
    and the scalar/row view the reference would have passed. Functions
    declaring ``particles`` (plural) — including R functions that relied on
    partial argument matching, exercised at
    /root/reference/tests/testthat/test-pmmh_tuning.R:121-123 — are treated
    as natively vectorized and called once with the full array.
    """
    names, _ = fn_param_names(move_fn)
    if "particle" not in names or "particles" in names:
        return adapt_fn(move_fn, "move_fn")

    import jax

    base = adapt_fn(move_fn, "move_fn")

    def vectorized(key, particles, **kwargs):
        keys = jax.random.split(key, particles.shape[0])
        return jax.vmap(
            lambda k, p: base(key=k, particle=p, **kwargs)
        )(keys, particles)

    vectorized.__name__ = getattr(move_fn, "__name__", "move_fn")
    return vectorized


def check_params_match(
    init_fn, transition_fn, log_likelihood_fn, pilot_init_params, log_priors
) -> None:
    """Validate that model-function parameter names match params and priors.

    Re-implements /root/reference/R/utils.R:15-72: the union of non-engine
    argument names across the three model functions must appear in both the
    initial-parameter dict and the log-prior dict.
    """
    adapt_fn(init_fn, "init_fn", required=("num_particles",))
    adapt_fn(transition_fn, "transition_fn", required=("particles",))
    adapt_fn(log_likelihood_fn, "log_likelihood_fn", required=("particles", "y"))

    fn_params = set()
    for fn in (init_fn, transition_fn, log_likelihood_fn):
        names, _ = fn_param_names(fn)
        fn_params |= names
    fn_params -= ENGINE_ARGS

    if not fn_params <= set(pilot_init_params):
        raise ValueError(
            "Parameters in functions do not match the names in pilot_init_params"
        )
    if not fn_params <= set(log_priors):
        raise ValueError(
            "Parameters in functions do not match the names in log_priors"
        )

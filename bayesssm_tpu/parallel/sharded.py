"""Particle-axis sharded bootstrap filter with distributed resampling.

Scale-out engine for very large particle counts: particles live sharded
across the ``"particles"`` mesh axis (chains across ``"chains"``), the
whole filter runs inside one ``shard_map``, and the per-step reductions
ride ICI collectives:

  * global weight normalization — ``pmax`` of the log-weight max followed by
    a ``psum`` of shifted-exponential sums, so the marginal-likelihood
    increment is exactly the single-device ``max + log(sum exp(lw - max))
    - log(N)`` telescoping term (unbiasedness preserved under sharding,
    BASELINE.md config 2);
  * global ESS — ``psum`` of squared normalized weights;
  * distributed systematic/stratified/multinomial resampling — every shard
    draws the SAME stratum offsets from the chain's key (placement-
    independent RNG), reconstructs the global CDF via ``all_gather`` over
    the particles axis, and gathers the ancestors for its own output slots.

The reference has no analogue — its resampling is a serial C++ loop over a
single process's vector (/root/reference/src/resampling.cpp); this is the
"distributed systematic resampling" component called out in SURVEY.md §7
step 7. Supports the BPF path (the PMMH hot loop); APF/RMPF variants run on
the unsharded engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from bayesssm_tpu.utils.signatures import adapt_fn

__all__ = ["sharded_bootstrap_filter"]


def sharded_bootstrap_filter(
    root_key,
    y,
    num_particles: int,
    init_fn,
    transition_fn,
    log_likelihood_fn,
    theta: dict,
    num_chains: int,
    mesh: Mesh,
    resample_algorithm: str = "SISAR",
    resample_fn: str = "systematic",
    threshold: float | None = None,
):
    """Run a chains+particles-sharded BPF; returns (loglike [C], state_est).

    Args:
      root_key: single PRNG key; chain streams derive from
        fold_in(root_key, global_chain_id) so results are independent of
        device placement.
      theta: dict of [num_chains] parameter arrays.
      mesh: a ("chains", "particles") mesh; num_chains and num_particles
        must be divisible by the respective axis sizes.
    """
    if resample_algorithm not in ("SIS", "SISR", "SISAR"):
        raise ValueError("resample_algorithm must be SIS, SISR or SISAR")
    if resample_fn not in ("systematic", "stratified", "multinomial"):
        raise ValueError("unknown resample_fn")

    cs = mesh.shape["chains"]
    ps = mesh.shape["particles"]
    if num_chains % cs or num_particles % ps:
        raise ValueError(
            "num_chains/num_particles must divide the mesh axis sizes"
        )
    n_local = num_particles // ps

    init = adapt_fn(init_fn, "init_fn", required=("num_particles",))
    trans = adapt_fn(transition_fn, "transition_fn", required=("particles",))
    weight = adapt_fn(
        log_likelihood_fn, "log_likelihood_fn", required=("particles", "y")
    )

    ys = jnp.asarray(y)
    if ys.ndim == 1:
        ys = ys[:, None]
    num_obs, d_y = ys.shape
    n_f = float(num_particles)
    if threshold is None:
        thr = n_f if resample_algorithm == "SISR" else n_f / 2.0
    else:
        thr = float(threshold)

    theta_stack = {k: jnp.asarray(v) for k, v in theta.items()}

    def shard_fn(ys_in, theta_local):
        # theta_local: dict of [C_local]; particles laid out [C_l, N_l, ...].
        c_idx = lax.axis_index("chains")
        p_idx = lax.axis_index("particles")
        c_local = next(iter(theta_local.values())).shape[0]
        chain_ids = c_idx * c_local + jnp.arange(c_local)
        chain_keys = jax.vmap(lambda i: jax.random.fold_in(root_key, i))(
            chain_ids
        )

        def theta_of(c):
            return {k: v[c] for k, v in theta_local.items()}

        def per_chain_init(ck, c):
            # Each shard draws its own slice's init stream.
            k = jax.random.fold_in(jax.random.fold_in(ck, 0), p_idx)
            return init(key=k, num_particles=n_local, **theta_of(c))

        particles = jax.vmap(per_chain_init)(chain_keys, jnp.arange(c_local))
        if particles.ndim == 2:
            particles = particles[..., None]

        def step(carry, xs):
            particles, loglike = carry
            y_row, t_i = xs
            y_i = y_row[0] if d_y == 1 else y_row

            def per_chain_trans(ck, c, p):
                k = jax.random.fold_in(
                    jax.random.fold_in(ck, t_i), p_idx
                )
                out = trans(key=k, particles=p, t=t_i, **theta_of(c))
                return out if out.ndim == 2 else out[:, None]

            particles = jax.vmap(per_chain_trans)(
                chain_keys, jnp.arange(c_local), particles
            )

            def per_chain_weight(c, p):
                lw = weight(
                    y=y_i,
                    particles=p if p.shape[-1] > 1 else p[:, 0],
                    t=t_i,
                    **theta_of(c),
                )
                return jnp.asarray(lw)

            lw = jax.vmap(per_chain_weight)(jnp.arange(c_local), particles)

            # ---- global normalization over the particles axis ----
            gmax = lax.pmax(jnp.max(lw, axis=-1), "particles")  # [C_l]
            shifted = jnp.exp(lw - gmax[:, None])
            gsum = lax.psum(jnp.sum(shifted, axis=-1), "particles")
            weights = shifted / gsum[:, None]  # globally normalized
            loglike = loglike + gmax + jnp.log(gsum) - jnp.log(n_f)

            ess = 1.0 / lax.psum(
                jnp.sum(jnp.square(weights), axis=-1), "particles"
            )

            # ---- distributed resampling ----
            w_all = lax.all_gather(
                weights, "particles", axis=1, tiled=True
            )  # [C_l, N]
            p_all = lax.all_gather(
                particles, "particles", axis=1, tiled=True
            )  # [C_l, N, d]
            cdf = jnp.cumsum(w_all, axis=-1)
            slots = p_idx * n_local + jnp.arange(n_local)

            def chain_positions(ck):
                # Identical draws on every particle shard: derived from the
                # chain key only.
                k = jax.random.fold_in(jax.random.fold_in(ck, t_i), 1000003)
                if resample_fn == "systematic":
                    u = jax.random.uniform(k, ())
                    return (slots + u) / n_f
                if resample_fn == "stratified":
                    u_full = jax.random.uniform(k, (num_particles,))
                    return (slots + u_full[slots]) / n_f
                u_full = jax.random.uniform(k, (num_particles,))
                return u_full[slots]

            pos = jax.vmap(chain_positions)(chain_keys)  # [C_l, n_local]
            idx = jax.vmap(
                lambda c, q: jnp.searchsorted(c, q, side="left")
            )(cdf, pos)
            idx = jnp.clip(idx, 0, num_particles - 1)
            resampled = jnp.take_along_axis(p_all, idx[..., None], axis=1)

            if resample_algorithm == "SIS":
                do = jnp.zeros_like(ess, dtype=bool)
            elif resample_algorithm == "SISR":
                do = jnp.ones_like(ess, dtype=bool)
            else:
                do = ess < thr
            particles = jnp.where(do[:, None, None], resampled, particles)
            uniform_local = jnp.full_like(weights, 1.0 / n_f)
            weights = jnp.where(do[:, None], uniform_local, weights)

            state = lax.psum(
                jnp.einsum("cn,cnd->cd", weights, particles), "particles"
            )
            return (particles, loglike), state

        loglike0 = jnp.zeros((c_local,), dtype=particles.dtype)
        ts = jnp.arange(1, num_obs + 1)
        (_, loglike), states = lax.scan(
            step, (particles, loglike0), (ys_in, ts)
        )
        return loglike, jnp.swapaxes(states, 0, 1)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, None), P("chains")),
        out_specs=(P("chains"), P("chains")),
        check_vma=False,
    )
    loglike, states = fn(ys, theta_stack)
    return loglike, states

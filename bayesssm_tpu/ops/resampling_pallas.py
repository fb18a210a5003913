"""Fused Pallas TPU kernel: weight normalization + ESS + resampling.

One VMEM-resident pass per chain fuses the whole per-observation weight
step of the particle filter (the ops the reference spreads across
R/particle_filter_core.R:204-224 and src/resampling.cpp):

    max-shift -> exp -> sum -> normalize -> ESS -> cumsum (CDF) ->
    inverse-CDF selection matrix -> MXU gather-by-matmul ->
    adaptive resample select

Instead of a serial inverse-CDF walk (the reference's C++) or a
searchsorted+gather pair (the portable jnp path in ops/resampling.py), the
ancestor selection is expressed as a boolean selection matrix
``M[j, i] = cdf_{i-1} <= pos_j < cdf_i`` contracted against the particle
block on the MXU — comparisons + one matmul, the TPU-native formulation.
Stratum positions are computed OUTSIDE the kernel (they carry the RNG and
the masked-lane logic), so the fused path is bit-compatible with the
portable path's sampling distribution.

Numerical contract vs the portable path: identical selection semantics
(first CDF crossing, last-lane clamp); weights/ESS agree to float32
rounding (different reduction orders).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_weight_resample", "pallas_available"]


def pallas_available() -> bool:
    """True when running on a TPU backend where the kernel can compile."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(lw_ref, particles_ref, pos_ref, uniform_ref, thr_ref,
            pout_ref, wout_ref, ess_ref, lse_ref, always_resample: bool):
    lw = lw_ref[0, :]                      # [N]
    n = lw.shape[0]
    mx = jnp.max(lw)
    shifted = jnp.exp(lw - mx)
    s = jnp.sum(shifted)
    w = shifted / s                        # normalized weights [N]
    sum_sq = jnp.sum(w * w)
    ess = 1.0 / sum_sq
    lse_ref[:, :] = (mx + jnp.log(s)).reshape(1, 1)  # caller subtracts log(n_alive)
    ess_ref[:, :] = ess.reshape(1, 1)

    # Cumulative sum as a Hillis-Steele shift-add scan (log2(n) VPU passes;
    # Mosaic has no cumsum primitive and a triangular-matmul formulation
    # compiles slowly at HIGHEST precision).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    cdf2 = w.reshape(1, n)
    shift = 1
    while shift < n:
        from jax.experimental.pallas import tpu as pltpu

        shifted_w = pltpu.roll(cdf2, shift, axis=1)
        cdf2 = cdf2 + jnp.where(lane >= shift, shifted_w, 0.0)
        shift *= 2
    cdf = cdf2[0]                                   # [N]
    cdf_prev = cdf - w
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    pos = pos_ref[0, :]                    # [N] stratum positions
    pos_col = pos.reshape(n, 1)
    # Selection matrix: output slot j takes the first ancestor i whose CDF
    # segment contains pos_j; clamp overflowing positions to the last lane.
    m = jnp.logical_and(
        pos_col >= cdf_prev.reshape(1, n), pos_col < cdf.reshape(1, n)
    )
    # Overflowing positions (float cumsum undershoot) clamp to the last
    # lane; expressed maskwise since Mosaic has no scatter.
    overflow = pos_col >= cdf[n - 1]                # [n, 1]
    is_last_col = col_ids == n - 1                  # [n, n]
    m = jnp.logical_or(m, jnp.logical_and(overflow, is_last_col))
    mf = m.astype(particles_ref.dtype)

    resampled = jnp.dot(
        mf, particles_ref[:, :], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(particles_ref.dtype)

    if always_resample:
        pout_ref[:, :] = resampled
        wout_ref[0, :] = uniform_ref[0, :]
    else:
        do = ess < thr_ref[0, 0]
        pout_ref[:, :] = jnp.where(do, resampled, particles_ref[:, :])
        wout_ref[0, :] = jnp.where(do, uniform_ref[0, :], w)


@functools.partial(
    jax.jit, static_argnames=("always_resample", "interpret")
)
def fused_weight_resample(
    log_weights,          # [N]
    particles,            # [N, d]
    positions,            # [N] inverse-CDF query positions (carry the RNG)
    uniform_w,            # [N] post-resample weights (masked-lane aware)
    threshold,            # scalar ESS threshold (ignored if always_resample)
    always_resample: bool = False,
    interpret: bool = False,
):
    """Fused weight step for one chain.

    Returns (particles_out [N, d], weights_out [N], ess [], logsumexp []).
    The caller computes the likelihood increment as ``logsumexp - log(n)``
    and handles SIS (no-resample) by not calling the fused path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = particles.shape
    dtype = particles.dtype
    kernel = functools.partial(_kernel, always_resample=always_resample)
    space = pltpu.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), dtype),
            jax.ShapeDtypeStruct((1, n), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
        ),
        interpret=interpret,
    )(
        log_weights.reshape(1, n).astype(dtype),
        particles,
        positions.reshape(1, n).astype(dtype),
        uniform_w.reshape(1, n).astype(dtype),
        jnp.asarray(threshold, dtype).reshape(1, 1),
    )
    pout, wout, ess, lse = out
    return pout, wout[0], ess[0, 0], lse[0, 0]

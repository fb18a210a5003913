"""Whole-sweep Pallas TPU kernel for the linear-Gaussian SSM.

Second instance of the whole-sweep `pf_impl` pattern
(ops/sir_sweep_pallas.py is the first): the ENTIRE T-observation
bootstrap filter for a block of chains runs in ONE kernel — state
resident in VMEM, Box-Muller normals from the on-chip PRNG, Gaussian
log-weights, likelihood increment, stratum positions, and the
O(N log N) merge-selection resample (ops/merge_select.py) per
observation. It exists to demonstrate that the escape-hatch pattern
generalizes beyond the SIR benchmark — and because the LGSS has an
EXACT Kalman ground truth (utils/kalman.py), it anchors a whole-sweep
kernel to an analytic log-marginal likelihood, which the SIR kernel
cannot.

Model (models/lgss.py, /root/reference vignette's AR(1) family):
    x_0 ~ N(0, p0^2),  x_t = a x_{t-1} + sigma_x eps_t,
    y_t ~ N(c x_t, sigma_y^2).

Unlike the SIR kernel there is no packing: the state is ONE float lane
and the merge network copies arbitrary f32 values exactly, so the raw
particle column rides the selection directly. Selection is merge-only
(stratified/systematic); multinomial positions are unsorted and raise.

Batching/PRNG/interpret rules follow ops/sir_sweep_pallas.py exactly:
``custom_vmap`` lowers the chain axis to one gridded kernel, the
hardware generator is seeded from the block's first chain's key mixed
with the program id, every chain's own key is XOR-mixed into its lanes'
bits, and interpret mode swaps in the counter-based lowbias32 stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bayesssm_tpu.ops.gillespie_pallas import _hash32
from bayesssm_tpu.ops.sir_sweep_pallas import _MERGE_BLOCK_CAP

__all__ = ["lgss_bpf_sweep", "lgss_sweep_pf_impl"]

_SELECTION_VMEM_BUDGET = 8 * 1024 * 1024


def _chains_per_program(c: int, n: int) -> int:
    stages = (2 * n - 1).bit_length()
    per_chain = 2 * n * 4 * (stages + 6)
    b = max(
        1,
        min(c, _MERGE_BLOCK_CAP, _SELECTION_VMEM_BUDGET // per_chain or 1),
    )
    return 1 << (b.bit_length() - 1)


def _make_kernel(n: int, num_obs: int, c_coef: float, p0: float,
                 method: str, always_resample: bool, software_prng: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np

    from bayesssm_tpu.ops.merge_select import (
        merge_select,
        resolve_carries,
    )

    inv24 = np.float32(1.0 / (1 << 24))
    neg = np.float32(-1e30)
    degenerate = np.float32(-1e8)
    two_pi = np.float32(2.0 * np.pi)
    half_log_2pi = np.float32(0.5 * np.log(2.0 * np.pi))

    def kernel(seed_ref, y_ref, sd0_ref, sd1_ref, a_ref, sx_ref, sy_ref,
               alive_ref, thr_ref, ll_ref, xs_ref):
        a = a_ref[:, :]                                   # [B, N] broadcast
        sx = sx_ref[:, :]
        sy = sy_ref[:, :]
        alive_ct = alive_ref[:, 0:1]
        thr = thr_ref[:, 0:1]
        b = a.shape[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
        lane_f = lane.astype(jnp.float32)
        alive_mask = lane_f < alive_ct

        seed0 = seed_ref[pl.program_id(0), 0]
        seed1 = seed_ref[pl.program_id(0), 1]
        sd0 = sd0_ref[:, :]
        sd1 = sd1_ref[:, :]
        rmix = sd0 ^ (sd1 * jnp.int32(-1640531527) + jnp.int32(1))
        rmix = rmix ^ ((rmix >> 16) & jnp.int32(0x0000FFFF))
        rmix = rmix * jnp.int32(0x7FEB352D)
        rmix = rmix ^ ((rmix >> 15) & jnp.int32(0x0001FFFF))
        rmix = rmix * jnp.int32(-2073254261)
        row_mix = jnp.broadcast_to(rmix, (b, n))
        if software_prng:
            pid = jax.lax.convert_element_type(pl.program_id(0), jnp.uint32)
            s0w = jax.lax.convert_element_type(seed0, jnp.uint32)
            s1w = jax.lax.convert_element_type(seed1, jnp.uint32)
            base = _hash32(s0w ^ _hash32(s1w ^ _hash32(pid)))
            row = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0)
            lane_id = jax.lax.convert_element_type(row * n + lane,
                                                   jnp.uint32)
            lane_mix = _hash32(base + lane_id * jnp.uint32(0x9E3779B9))
        else:
            pid = pl.program_id(0)
            s0_mix = seed0 ^ (pid * jnp.int32(-1640531527) + jnp.int32(1))
            pltpu.prng_seed(s0_mix, seed1)
            lane_mix = None

        def draw(nblk, ctr):
            if software_prng:
                d0 = jax.lax.convert_element_type(ctr, jnp.uint32)
                rm = jax.lax.convert_element_type(row_mix, jnp.uint32)
                bits = jnp.stack([
                    _hash32((lane_mix ^ rm)
                            ^ ((d0 + jnp.uint32(k))
                               * jnp.uint32(0x85EBCA6B)))
                    for k in range(nblk)
                ])
                u24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
            else:
                raw = pltpu.prng_random_bits((nblk, b, n))
                u24 = ((raw ^ row_mix[None]) >> 8) & jnp.int32(0x00FFFFFF)
            return u24.astype(jnp.float32) * inv24, ctr + jnp.int32(nblk)

        def draw_normal(ctr):
            """One [B, N] standard normal via Box-Muller."""
            u, ctr = draw(2, ctr)
            # 1 - u in (0, 1] keeps the log argument strictly positive.
            r = jnp.sqrt(-2.0 * jnp.log(1.0 - u[0]))
            return r * jnp.cos(two_pi * u[1]), ctr

        def roll(x, shift, axis=1):
            return pltpu.roll(x, shift, axis=axis)

        def draw_positions(ctr):
            u, ctr = draw(1, ctr)
            if method == "stratified":
                pos = (lane_f + u[0]) / alive_ct
            else:  # systematic
                u0 = jnp.max(jnp.where(lane == 0, u[0], 0.0), axis=-1,
                             keepdims=True)
                pos = (lane_f + u0) / alive_ct
            return jnp.where(alive_mask, pos, 1.0), ctr

        def select(w, pos, x):
            cdf = w
            shift = 1
            while shift < n:
                rolled = roll(cdf, shift)
                cdf = cdf + jnp.where(lane >= shift, rolled, 0.0)
                shift *= 2
            shift = 1
            while shift < n:
                rolled = roll(cdf, shift)
                cdf = jnp.maximum(cdf, jnp.where(lane >= shift, rolled, 0.0))
                shift *= 2
            cdf_ext = jnp.where(
                lane_f >= alive_ct - 1.0, np.float32(1.5), cdf
            )
            x_carry = resolve_carries(cdf_ext, roll(x, n - 1), lane, roll)
            # Lane-0 fallback by single-term sum (x may be negative, so
            # the SIR kernel's masked-max trick does not apply).
            x0 = jnp.sum(jnp.where(lane == 0, x, 0.0), axis=-1,
                         keepdims=True)
            x_res = merge_select(cdf_ext, pos, x_carry, x0, lane, roll)
            return jnp.where(alive_mask, x_res, 0.0)

        # t = 0: x0 ~ N(0, p0^2), uniform weights.
        ctr = jnp.int32(0)
        z0, ctr = draw_normal(ctr)
        x = np.float32(p0) * z0
        loglike = jnp.zeros((b, 1), jnp.float32)
        dead = jnp.zeros((b, 1), jnp.float32)

        t1 = xs_ref.shape[1]
        est_col = jax.lax.broadcasted_iota(jnp.int32, (b, t1), 1)
        w0 = jnp.where(alive_mask, 1.0 / alive_ct, 0.0)
        xs_acc = jnp.where(
            est_col == 0,
            jnp.sum(w0 * x, axis=-1, keepdims=True),
            0.0,
        )

        def day(t, carry):
            x, loglike, dead, ctr, xs_acc = carry
            est_mask = est_col == t + 1
            y_t = y_ref[t]

            z, ctr = draw_normal(ctr)
            x = a * x + sx * z

            resid = (y_t - np.float32(c_coef) * x) / sy
            lw = -0.5 * resid * resid - jnp.log(sy) - half_log_2pi
            lw = jnp.where(alive_mask, lw, neg)

            mx = jnp.max(lw, axis=-1, keepdims=True)
            dead = jnp.maximum(dead, (mx < degenerate).astype(jnp.float32))
            shifted = jnp.exp(lw - mx)
            ssum = jnp.sum(shifted, axis=-1, keepdims=True)
            w = shifted / ssum
            ess = 1.0 / jnp.sum(w * w, axis=-1, keepdims=True)
            loglike = loglike + mx + jnp.log(ssum) - jnp.log(alive_ct)

            pos, ctr = draw_positions(ctr)
            x_res = select(w, pos, x)

            if always_resample:
                x = x_res
                est_w = jnp.where(alive_mask, 1.0 / alive_ct, 0.0)
            else:
                do_rows = jnp.broadcast_to(ess < thr, (b, n))
                x = jnp.where(do_rows, x_res, x)
                est_w = jnp.where(
                    do_rows, jnp.where(alive_mask, 1.0 / alive_ct, 0.0), w
                )

            live_f = 1.0 - dead
            est = jnp.sum(est_w * x, axis=-1, keepdims=True) * live_f
            xs_acc = jnp.where(est_mask, est, xs_acc)
            return x, loglike, dead, ctr, xs_acc

        x, loglike, dead, ctr, xs_acc = jax.lax.fori_loop(
            0, num_obs, day, (x, loglike, dead, ctr, xs_acc)
        )
        ll_ref[:, :] = jnp.where(dead > 0.0, -jnp.inf, loglike)
        xs_ref[:, :] = xs_acc

    return kernel


def _batched_call(seeds, a, sx, sy, alive, thr, y, *, n_static, c_coef,
                  p0, method, always_resample, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = a.shape[0]
    n = n_static
    num_obs = y.shape[0]
    t1 = num_obs + 1

    b = _chains_per_program(c, n)
    g = -(-c // b)
    pad = g * b - c
    if pad:
        def padc(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

        seeds = padc(seeds)
        a = padc(a)
        # Inert padded chains: one alive lane, unit scales (NOT zero —
        # sigma enters a division in the weight).
        sx = jnp.pad(sx, (0, pad), constant_values=1.0)
        sy = jnp.pad(sy, (0, pad), constant_values=1.0)
        alive = jnp.pad(alive, (0, pad), constant_values=1.0)
        thr = jnp.pad(thr, (0, pad), constant_values=1.0)

    kernel = _make_kernel(
        n, int(num_obs), float(c_coef), float(p0), method,
        bool(always_resample), bool(interpret),
    )
    space = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM

    def spec(*dims):
        return pl.BlockSpec(
            (None,) + dims, lambda idx: (idx,) + (0,) * len(dims),
            memory_space=space,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda idx: (0,) * len(shape), memory_space=smem
        )

    def col(x):
        return jnp.broadcast_to(
            x.astype(jnp.float32)[:, None], (g * b, n)
        ).reshape(g, b, n)

    def scol(x):
        return jnp.broadcast_to(x[:, None], (g * b, n)).reshape(g, b, n)

    sdim = (b, n)
    ll, xs = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=(
            jax.ShapeDtypeStruct((g, b, 1), jnp.float32),
            jax.ShapeDtypeStruct((g, b, t1), jnp.float32),
        ),
        in_specs=[
            whole((g, 2)),
            whole((num_obs,)),
            spec(*sdim), spec(*sdim),       # per-chain seed words
            spec(*sdim), spec(*sdim), spec(*sdim),
            spec(*sdim), spec(*sdim),
        ],
        out_specs=(spec(b, 1), spec(b, t1)),
        interpret=interpret,
    )(
        seeds.reshape(g, b, 2)[:, 0, :],
        y.astype(jnp.float32),
        scol(seeds[:, 0]),
        scol(seeds[:, 1]),
        col(a), col(sx), col(sy), col(alive), col(thr),
    )
    return ll.reshape(g * b)[:c], xs.reshape(g * b, t1)[:c]


@functools.lru_cache(maxsize=None)
def _make_op(n_static, c_coef, p0, method, always_resample, interpret):
    kw = dict(
        n_static=n_static, c_coef=c_coef, p0=p0, method=method,
        always_resample=always_resample, interpret=interpret,
    )

    @jax.custom_batching.custom_vmap
    def op(seeds, a, sx, sy, alive, thr, y):
        ll, xs = _batched_call(
            seeds[None], a[None], sx[None], sy[None], alive[None],
            thr[None], y, **kw,
        )
        return ll[0], xs[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, seeds, a, sx, sy, alive, thr, y):
        if in_batched[6]:
            raise ValueError(
                "lgss_bpf_sweep: y is shared across chains and cannot be "
                "vmapped"
            )

        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        args = [
            ensure(x, bt)
            for x, bt in zip((seeds, a, sx, sy, alive, thr), in_batched[:6])
        ]
        out = _batched_call(*args, y, **kw)
        return out, (True, True)

    return op


def lgss_bpf_sweep(
    key,
    y,
    num_particles,
    a,
    sigma_x,
    sigma_y,
    c: float = 1.0,
    p0: float = 1.0,
    max_particles: int | None = None,
    resample_fn: str = "stratified",
    resample_algorithm: str = "SISAR",
    threshold=None,
    interpret: bool = False,
):
    """Full LGSS bootstrap-filter sweep in one fused TPU kernel.

    Same contract shape as ``sir_bpf_sweep``: returns
    ``(loglike, state_est [T+1])`` distribution-identical to
    ``bootstrap_filter`` over ``lgss_model(c, p0)`` (bit-streams differ;
    the log-marginal likelihood is Kalman-anchored in
    tests/test_lgss_sweep.py). Selection is merge-only, so
    ``resample_fn`` must be stratified or systematic.
    """
    if resample_algorithm not in ("SISR", "SISAR"):
        raise ValueError("lgss_bpf_sweep supports SISR or SISAR only")
    if resample_fn not in ("stratified", "systematic"):
        raise ValueError(
            "lgss_bpf_sweep resamples through the merge network and "
            "requires sorted positions (stratified/systematic)"
        )
    if max_particles is None:
        max_particles = int(num_particles)
    n_static = int(max_particles)
    if n_static % 128 or n_static > 1024:
        raise ValueError(
            "max_particles must be a multiple of 128 and <= 1024"
        )

    ys = jnp.asarray(y, jnp.float32).reshape(-1)
    kd = jnp.ravel(jax.random.key_data(key))[:2]
    seeds = jax.lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)
    alive = jnp.asarray(num_particles, jnp.float32).reshape(())
    thr = (
        jnp.asarray(threshold, jnp.float32).reshape(())
        if threshold is not None
        else alive / 2.0
    )
    a = jnp.asarray(a, jnp.float32).reshape(())
    sx = jnp.asarray(sigma_x, jnp.float32).reshape(())
    sy = jnp.asarray(sigma_y, jnp.float32).reshape(())

    op = _make_op(
        n_static, float(c), float(p0), resample_fn,
        resample_algorithm == "SISR", bool(interpret),
    )
    return op(seeds, a, sx, sy, alive, thr, ys)


def lgss_sweep_pf_impl(c: float = 1.0, p0: float = 1.0,
                       interpret: bool = False):
    """PMMH ``pf_impl`` factory for the LGSS whole-sweep kernel.

    The second instance of the escape-hatch pattern
    (models/sir.py::sir_sweep_pf_impl is the first): parameters
    {a, sigma_x, sigma_y} as in ``models/lgss.py::lgss_model``.
    """
    def factory(
        y,
        num_particles,
        param_names,
        model_fns,
        obs_times,
        algorithm,
        resample_algorithm,
        resample_fn,
        carry_weights,
        max_particles=None,
    ):
        del model_fns
        if algorithm != "BPF":
            raise ValueError("lgss_sweep_pf_impl supports BPF only")
        if obs_times is not None:
            raise ValueError(
                "lgss_sweep_pf_impl supports contiguous obs_times only"
            )
        if carry_weights:
            raise ValueError(
                "lgss_sweep_pf_impl implements the reference fresh-weight "
                "semantics (carry_weights=False)"
            )
        if set(param_names) != {"a", "sigma_x", "sigma_y"}:
            raise ValueError(
                "lgss_sweep_pf_impl expects parameters "
                "{'a', 'sigma_x', 'sigma_y'}"
            )
        j_a = param_names.index("a")
        j_sx = param_names.index("sigma_x")
        j_sy = param_names.index("sigma_y")
        ys = jnp.asarray(y, jnp.float32)

        def pf(key, theta_vec, n=num_particles):
            return lgss_bpf_sweep(
                key, ys, n, theta_vec[j_a], theta_vec[j_sx],
                theta_vec[j_sy], c=c, p0=p0,
                max_particles=max_particles
                if max_particles is not None
                else n,
                resample_fn=resample_fn,
                resample_algorithm=resample_algorithm,
                interpret=interpret,
            )

        return pf

    return factory

"""Fully fused Pallas TPU kernels: whole SIR filter sweeps (BPF/APF/RMPF).

Round-2 profiling (scripts/profile_amortized.py) attributed the 14 ms PMMH
MH step at [4096 chains x 128 particles x T=10] as ~2.5 ms Gillespie
kernels + ~7.3 ms fused weight+resample kernels + ~3.7 ms XLA glue
(per-day [C, N, 2] stack/unstack relayouts, threefry stratum positions,
scan plumbing). This kernel removes the glue and the per-day kernel
boundaries entirely: ONE ``pallas_call`` runs the full T-observation
bootstrap filter for a block of chains with the particle state resident in
VMEM throughout —

    for t in 1..T:   (lax.fori_loop; ten unrolled copies of the selection
                      block made Mosaic compilation take minutes)
      exact Gillespie day step   (hardware-PRNG while_loop, as in
                                  ops/gillespie_pallas.py)
      Poisson log-weights        (lgamma(y+1) precomputed on host)
      max-shift normalize + ESS + likelihood increment
      stratum positions          (drawn from the SAME in-kernel PRNG)
      Hillis-Steele CDF + selection-matrix resample

with the (S, I) pair packed into ONE f32 lane (``v = S*4096 + I``, exact
for populations <= 4094 because both counts are integers < 2^12 and the
unpack divides by a power of two) so the O(N^2) masked-reduce gather runs
once instead of once per state column.

Semantics are the reference filters with fresh-weight SISAR/SISR
(/root/reference/R/particle_filter_core.R:123-246, quirks Q4/Q5 as in
filters/core.py's default ``carry_weights=False``), including masked lanes
(per-chain traced ``num_particles``, SURVEY.md Q9) and the degenerate
-inf contract (all log-weights < -1e8 => loglike -inf, zeroed estimates).
The ``algorithm`` parameter adds the APF's auxiliary stage (lookahead
weights, forced aux resample, Q2 double transition, corrected weights —
/root/reference/R/auxiliary_filter.R via particle_filter_core.R:139-175)
and the RMPF's forced-SISR + in-kernel Metropolis rejuvenation move
(/root/reference/R/resample_move_filter.R:190-236); see ``_make_kernel``.
Returned per chain: ``(loglike, state_est [T+1, 2])`` — exactly what the
PMMH hot loop consumes.

Batching/PRNG/interpret rules follow ops/gillespie_pallas.py: a
``custom_vmap`` lowers the chain axis to one gridded kernel; the hardware
generator is seeded from each block's first chain's key mixed with the
program id, and every chain's OWN key is additionally XOR-mixed into its
lanes' bits, so no chain's stream is a function of another chain's key
alone (bit-reproducible for a fixed (key, blocking)); interpret mode swaps
the hardware PRNG for the counter-based lowbias32 stream so CPU CI
executes every other kernel line.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bayesssm_tpu.ops.gillespie_pallas import MAX_EVENTS, _hash32

__all__ = ["sir_filter_sweep", "sir_bpf_sweep"]

# Chains per grid program: bounded by the [B, N, N] selection-matrix
# intermediates in VMEM (same budget logic as ops/resampling_pallas.py).
# Round-3 attribution (scripts/profile_sweep_boundary.py): the Gillespie
# while_loop is iteration-latency-bound, so FEWER/LARGER blocks win — the
# full sweep measured 14.5 ms/step at B=32 (2 MB) vs 11.5 ms at B=128
# (8 MB); the selection intermediates stream through VMEM one at a time,
# so the larger budget compiles and runs within the 16 MB limit.
_SELECTION_VMEM_BUDGET = 8 * 1024 * 1024
# S/I packing base: both counts are integers <= n_total <= _PACK - 2, so
# v = S*_PACK + I < 2^24 is exact in f32 and v/_PACK is an exact exponent
# shift (power of two), making floor-unpack exact.
_PACK = 4096.0
# Profiling hook (scripts/profile_sweep_boundary.py): phases to stub out
# when attributing in-kernel cost ("gillespie", "resample", "writes",
# "stack", "log1p" [replace the exponential-waiting-time transcendental
# with a multiply — wrong distribution, cost probe only], "draws" [reuse
# one uniform block instead of drawing per iteration]). Never set outside
# profiling runs.
_DEBUG_SKIP: tuple = ()
# Chain-block cap for merge-selection mode. Without the [B, N, N]
# intermediate the VMEM budget admits much larger chain blocks; the
# round-4 sweep over caps {64, 128, 256, 512} x unroll {8, 16} measured
# 399.5k / 451.6k / 474.2k / VMEM-OOM (16.02M vs the 16M scoped limit)
# samples/s at the bench shape with unroll 8 — fewer, larger programs
# win (per-program launch overhead dominates the wider block-max event
# tail). 256 is the measured best that compiles.
_MERGE_BLOCK_CAP = 256


def _chains_per_program(c: int, n: int, selection: str = "quadratic") -> int:
    if selection == "merge":
        # No [B, N, N] intermediate: VMEM holds ~log2(2N) recorded swap
        # masks plus a handful of working columns, all [B, 2N]. See
        # _MERGE_BLOCK_CAP for the measured block economics.
        stages = (2 * n - 1).bit_length()
        per_chain = 2 * n * 4 * (stages + 6)
        b = max(
            1,
            min(c, _MERGE_BLOCK_CAP, _SELECTION_VMEM_BUDGET // per_chain
                or 1),
        )
    else:
        b = max(1, min(c, _SELECTION_VMEM_BUDGET // (n * n * 4) or 1))
    return 1 << (b.bit_length() - 1)


def _make_kernel(n: int, n_total: float, num_obs: int, unroll: int,
                 method: str, always_resample: bool, software_prng: bool,
                 algorithm: str = "BPF", move_step_max: int = 2,
                 selection: str = "quadratic"):
    """Return the kernel body closure with the particle width ``n`` static.

    ``algorithm`` selects the per-observation step:
      * ``"BPF"``  — Gillespie day, Poisson weights, adaptive resample.
      * ``"APF"``  — Gillespie day, auxiliary Poisson lookahead weights,
        forced auxiliary resample, SECOND Gillespie day (quirk Q2,
        /root/reference/R/particle_filter_core.R:139-175), corrected
        weights ``lw - aux_anc``, adaptive resample. The ancestor aux
        weight is RECOMPUTED from the selected (S, I) instead of carried
        through the selection: the aux weight is a deterministic function
        of I and y_t, so the recompute equals the gather exactly while
        keeping the telescoped selection on packed integers (a float
        column would not telescope exactly in f32).
      * ``"RMPF"`` — Gillespie day, Poisson weights, forced resample
        (SISR, mirroring filters/resample_move.py), in-kernel
        Metropolis rejuvenation move on I (models/sir.py::sir_move_fn:
        propose I + U{-k..k}, accept with the Poisson likelihood ratio,
        reject outside [0, n_total - S]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np

    # Plain numpy scalars: jnp constants created outside the kernel body
    # would be captured as pallas_call "constants" and rejected.
    inv24 = np.float32(1.0 / (1 << 24))
    neg = np.float32(-1e30)
    degenerate = np.float32(-1e8)

    def kernel(seed_ref, y_ref, lgy_ref, sd0_ref, sd1_ref, lam_ref, gam_ref,
               alive_ref, thr_ref, s0_ref, i0_ref, ll_ref, ses_ref, sei_ref):
        lam = lam_ref[:, :]                               # [B, N] broadcast
        gam = gam_ref[:, :]
        alive_ct = alive_ref[:, 0:1]                      # [B, 1] f32
        thr = thr_ref[:, 0:1]
        b = lam.shape[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
        lane_f = lane.astype(jnp.float32)
        alive_mask = lane_f < alive_ct                    # [B, N]

        seed0 = seed_ref[pl.program_id(0), 0]
        seed1 = seed_ref[pl.program_id(0), 1]
        # Per-chain seed mix: every chain's OWN key feeds its lanes' bits
        # (XOR below), so chains within a block are not a deterministic
        # function of the block's first key alone — keeps independent-chain
        # diagnostics (R-hat, cross-chain ESS) honest. int32 throughout
        # (wrapping multiply matches uint32 bit-for-bit; Mosaic has no
        # vector uint32<->f32 casts). Finalized with a lowbias32-style
        # xorshift-multiply so adjacent fold_in seeds decorrelate.
        sd0 = sd0_ref[:, :]                               # [B, 1] int32
        sd1 = sd1_ref[:, :]
        rmix = sd0 ^ (sd1 * jnp.int32(-1640531527) + jnp.int32(1))
        rmix = rmix ^ ((rmix >> 16) & jnp.int32(0x0000FFFF))
        rmix = rmix * jnp.int32(0x7FEB352D)
        rmix = rmix ^ ((rmix >> 15) & jnp.int32(0x0001FFFF))
        rmix = rmix * jnp.int32(-2073254261)              # 0x846CA68B
        row_mix = jnp.broadcast_to(rmix, (b, n))          # [B, N] int32
        if software_prng:
            pid = jax.lax.convert_element_type(pl.program_id(0), jnp.uint32)
            s0w = jax.lax.convert_element_type(seed0, jnp.uint32)
            s1w = jax.lax.convert_element_type(seed1, jnp.uint32)
            base = _hash32(s0w ^ _hash32(s1w ^ _hash32(pid)))
            row = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0)
            lane_id = jax.lax.convert_element_type(
                row * n + lane, jnp.uint32
            )
            lane_mix = _hash32(base + lane_id * jnp.uint32(0x9E3779B9))
        else:
            # Program id mixed into the first seed word (Mosaic caps
            # prng_seed at 2 values); odd-constant wrapping multiply is a
            # bijection so programs get distinct streams — exactly the
            # ops/gillespie_pallas.py convention.
            pid = pl.program_id(0)
            s0_mix = seed0 ^ (pid * jnp.int32(-1640531527) + jnp.int32(1))
            pltpu.prng_seed(s0_mix, seed1)
            lane_mix = None

        def draw(nblk, ctr):
            """nblk [B, N] uniform f32 blocks in [0, 1); advances ctr."""
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
                # SIGNED int32 on TPU Mosaic: mask after the arithmetic
                # shift (see ops/gillespie_pallas.py). XOR with the
                # per-chain mix BEFORE the shift: low 24 bits stay uniform
                # and each chain's own key enters its stream.
                u24 = ((raw ^ row_mix[None]) >> 8) & jnp.int32(0x00FFFFFF)
            return u24.astype(jnp.float32) * inv24, ctr + jnp.int32(nblk)

        s = jnp.broadcast_to(s0_ref[:, :], (b, n))
        i = jnp.broadcast_to(i0_ref[:, :], (b, n))
        loglike = jnp.zeros((b, 1), jnp.float32)
        dead = jnp.zeros((b, 1), jnp.float32)
        ctr = jnp.int32(0)

        # Estimate columns accumulate in vector registers and are written
        # ONCE after the day loop: a dynamic-lane-index vector store
        # (ses_ref[:, pl.ds(t + 1, 1)]) inside fori_loop fails Mosaic
        # lowering on hardware (tpu.vector_store with a traced minor
        # index); the iota-mask merge below is a handful of lanes per day.
        t1 = ses_ref.shape[1]
        est_col = jax.lax.broadcasted_iota(jnp.int32, (b, t1), 1)
        # t = 0: uniform weights over identical initial particles (Q4/Q5).
        ses_acc = jnp.where(
            est_col == 0, jnp.broadcast_to(s0_ref[:, 0:1], (b, t1)), 0.0
        )
        sei_acc = jnp.where(
            est_col == 0, jnp.broadcast_to(i0_ref[:, 0:1], (b, t1)), 0.0
        )

        # lam/n_total is loop-invariant; hoisted out of the event body.
        lam_n = lam * np.float32(1.0 / n_total)

        def run_gillespie(s, i, ctr):
            """One exact Gillespie day (while_loop, unrolled draws)."""
            tloc = jnp.zeros((b, n), jnp.float32)
            active = (i > 0.0).astype(jnp.float32)

            def cond(carry):
                _, _, _, act, steps, _ = carry
                return jnp.logical_and(
                    jnp.max(act) > 0.0, steps < MAX_EVENTS
                )

            if "draws" in _DEBUG_SKIP:  # cost probe only: one shared block
                u_fixed, ctr = draw(2 * unroll, ctr)

            def body(carry):
                s, i, tloc, active, steps, ctr = carry
                if "draws" in _DEBUG_SKIP:
                    u = u_fixed
                else:
                    u, ctr = draw(2 * unroll, ctr)
                for e in range(unroll):
                    # Event arithmetic trimmed to ONE division per event
                    # (profiled ~55% of the step in this loop): no
                    # rate_tot > 0 guard or `safe` select — for any live
                    # lane i >= 1 and gam > 0 (exp-transformed proposals
                    # are strictly positive, and gam*i cannot underflow
                    # for i >= 1), so rate_tot >= gam > 0; dead lanes
                    # (i = 0) produce inf/NaN that every consumer gates
                    # behind `fire`, which is false there (IEEE: NaN
                    # compares false). The branch decision uses
                    # u * rate_tot < rate_inf (multiply) instead of
                    # u < rate_inf/rate_tot (a second division).
                    rate_inf = lam_n * s * i
                    rate_tot = rate_inf + gam * i
                    if "log1p" in _DEBUG_SKIP:  # cost probe only
                        # (u + 0.5) keeps the mean waiting time 1/rate so
                        # the iteration-count distribution stays roughly
                        # comparable to the exponential it replaces.
                        # NOTE the probe overstates log1p's cost: most of
                        # its delta is the narrower waiting-time spread
                        # (fewer block-max while iterations). A hand-rolled
                        # bit-split + degree-8 minimax log measured 2.4 ms
                        # SLOWER than jnp.log1p at the bench shape —
                        # Mosaic's transcendentals are hardware-assisted;
                        # do not replace them with polynomials.
                        dt = (u[2 * e] + 0.5) * (1.0 / rate_tot)
                    else:
                        dt = -jnp.log1p(-u[2 * e]) * (1.0 / rate_tot)
                    t_new = tloc + dt
                    fire = jnp.logical_and(active > 0.0, t_new <= 1.0)
                    infect = u[2 * e + 1] * rate_tot < rate_inf
                    s = jnp.where(jnp.logical_and(fire, infect), s - 1.0, s)
                    i = jnp.where(
                        fire, jnp.where(infect, i + 1.0, i - 1.0), i
                    )
                    tloc = jnp.where(fire, t_new, tloc)
                    active = jnp.logical_and(fire, i > 0.0).astype(
                        jnp.float32
                    )
                return s, i, tloc, active, steps + unroll, ctr

            if "gillespie" in _DEBUG_SKIP:  # profiling stub: one cheap draw
                u, ctr = draw(1, ctr)
                i = jnp.maximum(i - jnp.floor(3.0 * u[0]), 0.0)
                return s, i, ctr
            s, i, _, _, _, ctr = jax.lax.while_loop(
                cond, body,
                (s, i, tloc, active, jnp.zeros((), jnp.int32), ctr),
            )
            return s, i, ctr

        def obs_logw(i_arr, y_t, lgy_t):
            """Poisson log-weights (models/distributions.pois_logpmf),
            masked lanes pinned to ``neg``."""
            safe_i = jnp.where(i_arr > 0.0, i_arr, 1.0)
            lw = y_t * jnp.log(safe_i) - i_arr - lgy_t
            lw = jnp.where(
                i_arr > 0.0, lw, jnp.where(y_t == 0.0, 0.0, neg)
            )
            return jnp.where(alive_mask, lw, neg)

        def draw_positions(ctr):
            """Stratum positions from the in-kernel PRNG."""
            u, ctr = draw(1, ctr)
            if method == "stratified":
                pos = (lane_f + u[0]) / alive_ct
            elif method == "systematic":
                # One shared offset per chain: lane 0's draw.
                u0 = jnp.max(jnp.where(lane == 0, u[0], 0.0), axis=-1,
                             keepdims=True)
                pos = (lane_f + u0) / alive_ct
            else:  # multinomial
                pos = u[0]
            return jnp.where(alive_mask, pos, 1.0), ctr

        def select(w, pos, s, i):
            """CDF (Hillis-Steele) + inverse-CDF selection.

            ``selection`` picks the selection algorithm: "quadratic" is
            the [B, N, N] telescoped masked-reduce (3 VPU ops/element,
            measured-best at N = 128); "merge" is the O(N log N)
            bitonic-merge network (ops/merge_select.py) that removes the
            N^2 cliff at the Q10-reachable N = 1024. Both are exact and
            sample identical ancestors from identical (w, pos).
            """
            cdf = w
            shift = 1
            while shift < n:
                rolled = pltpu.roll(cdf, shift, axis=1)
                cdf = cdf + jnp.where(lane >= shift, rolled, 0.0)
                shift *= 2
            # Running-max pass: a parallel-scan f32 CDF is not monotone
            # (per-lane reduction trees differ by ULPs); without it a
            # position inside a wiggle matches TWO buckets and the packed
            # sum decodes to an invalid state (see resampling_pallas.py).
            shift = 1
            while shift < n:
                rolled = pltpu.roll(cdf, shift, axis=1)
                cdf = jnp.maximum(cdf, jnp.where(lane >= shift, rolled, 0.0))
                shift *= 2
            v = s * _PACK + i                               # packed column
            v0 = jnp.max(jnp.where(lane == 0, v, neg), axis=-1,
                         keepdims=True)                     # [B, 1]
            if selection == "merge":
                # O(N log N) bitonic-merge selection (ops/merge_select.py
                # for the algorithm and its exactness argument). The
                # sentinel must stay finite and < 2.0 (int-key bitcast);
                # it exceeds every position (pos <= 1.0), so the clamp
                # semantics match the quadratic branch's +inf pin.
                from bayesssm_tpu.ops.merge_select import (
                    merge_select,
                    resolve_carries,
                )

                def roll(x, shift, axis=1):
                    return pltpu.roll(x, shift, axis=axis)

                cdf_ext = jnp.where(
                    lane_f >= alive_ct - 1.0, np.float32(1.5), cdf
                )
                v_next = pltpu.roll(v, n - 1, axis=1)       # v[j + 1]
                v_carry = resolve_carries(cdf_ext, v_next, lane, roll)
                v_res = merge_select(cdf_ext, pos, v_carry, v0, lane, roll)
            else:
                # Telescoped inverse-CDF selection: the matched lane is
                # m_k = #{j : cdf_j <= pos_k} (monotone running-max CDF =>
                # exactly one bucket), and
                #   v_res_k = v_0 + sum_j [cdf_j <= pos_k] * (v_{j+1} - v_j)
                # telescopes to v_{m_k}. One compare + select + add per
                # [B, N, N] element and one fewer N^2 operand stream than
                # the two-edge bucket match (pos >= prev & pos < cdf) it
                # replaces — measured ~0.85x step time at the bench shape.
                # Exact in f32: every reduction subtree spans contiguous
                # lanes, and a prefix-masked contiguous sum of dv
                # telescopes to a difference of two packed values < 2^24.
                # Overshoot clamp: cumsum rounding can leave
                # cdf[last_alive] below a near-1 position, and masked
                # lanes carry the running total (a pos draw just under 1
                # could "pass" them). Pinning cdf = +inf from the LAST
                # ALIVE lane on caps m_k at alive_ct - 1, matching
                # resample_indices' clamp (ops/resampling.py);
                # masked-lane positions (pinned 1.0) resolve to a COPY of
                # the last alive particle and are zeroed after the unpack
                # below — without the zeroing those copies stay active
                # (i > 0) and lengthen the block-max Gillespie while_loop
                # whenever num_particles < max_particles.
                cdf_ext = jnp.where(lane_f >= alive_ct - 1.0, jnp.inf, cdf)
                # v_{j+1} - v_j (roll by n-1 == roll by -1; negative
                # shifts are rejected). The wrapped lane n-1 never
                # contributes: its cdf_ext is +inf for any alive_ct.
                dv = pltpu.roll(v, n - 1, axis=1) - v
                shape3 = (b, n, n)
                pos_b = jnp.broadcast_to(pos[:, :, None], shape3)
                cdf_b = jnp.broadcast_to(cdf_ext[:, None, :], shape3)
                dv_b = jnp.broadcast_to(dv[:, None, :], shape3)
                v_res = v0 + jnp.sum(
                    jnp.where(cdf_b <= pos_b, dv_b, jnp.zeros_like(dv_b)),
                    axis=2,
                )
            s_res = jnp.floor(v_res * (1.0 / _PACK))        # exact unpack
            i_res = v_res - s_res * _PACK
            # Masked lanes -> inert zero state (every downstream consumer
            # additionally gates on alive_mask, so this is purely about
            # keeping dead lanes out of the Gillespie active set).
            s_res = jnp.where(alive_mask, s_res, 0.0)
            i_res = jnp.where(alive_mask, i_res, 0.0)
            return s_res, i_res

        # The day recursion is a fori_loop, not a python unroll: ten
        # copies of the selection block made Mosaic compilation take
        # minutes at B=128 (round 3); the rolled loop compiles ~10x less
        # code with identical semantics (t-dependent scalar reads from
        # SMEM, pl.ds column stores).
        def day(t, carry):
            s, i, loglike, dead, ctr, ses_acc, sei_acc = carry
            est_mask = est_col == t + 1                       # [B, T+1]
            y_t = y_ref[t]
            lgy_t = lgy_ref[t]

            # ---- propagate one observation interval ----
            s, i, ctr = run_gillespie(s, i, ctr)

            if algorithm == "APF":
                # ---- auxiliary lookahead stage (core.py:419-478) ----
                aux_lw = obs_logw(i, y_t, lgy_t)
                mxa = jnp.max(aux_lw, axis=-1, keepdims=True)
                # Degenerate aux weights kill the chain like degenerate
                # main weights (the reference's sample() would error on
                # all-zero probabilities; core.py maps it to -inf).
                dead = jnp.maximum(
                    dead, (mxa < degenerate).astype(jnp.float32)
                )
                sha = jnp.exp(aux_lw - mxa)
                wa = sha / jnp.sum(sha, axis=-1, keepdims=True)
                pos_a, ctr = draw_positions(ctr)
                s, i = select(wa, pos_a, s, i)
                # Ancestor aux weight, recomputed == gathered (see
                # _make_kernel docstring).
                aux_anc = obs_logw(i, y_t, lgy_t)
                # Q2: second transition after the auxiliary resample.
                s, i, ctr = run_gillespie(s, i, ctr)
                lw = obs_logw(i, y_t, lgy_t) - aux_anc
                lw = jnp.where(alive_mask, lw, neg)
            else:
                lw = obs_logw(i, y_t, lgy_t)

            # ---- normalize + ESS + likelihood increment ----
            mx = jnp.max(lw, axis=-1, keepdims=True)          # [B, 1]
            dead = jnp.maximum(dead, (mx < degenerate).astype(jnp.float32))
            shifted = jnp.exp(lw - mx)
            ssum = jnp.sum(shifted, axis=-1, keepdims=True)
            w = shifted / ssum
            ess = 1.0 / jnp.sum(w * w, axis=-1, keepdims=True)
            loglike = loglike + mx + jnp.log(ssum) - jnp.log(alive_ct)

            pos, ctr = draw_positions(ctr)

            if algorithm == "BPF" and "resample" in _DEBUG_SKIP:
                # profiling stub: no selection
                if "writes" not in _DEBUG_SKIP:
                    ses_acc = jnp.where(
                        est_mask,
                        jnp.sum(w * s, axis=-1, keepdims=True), ses_acc,
                    )
                    sei_acc = jnp.where(
                        est_mask,
                        jnp.sum(w * i, axis=-1, keepdims=True), sei_acc,
                    )
                return s, i, loglike, dead, ctr, ses_acc, sei_acc

            s_res, i_res = select(w, pos, s, i)

            if always_resample:
                s, i = s_res, i_res
                est_w = None                                 # uniform
            else:
                do = ess < thr                               # [B, 1]
                do_rows = jnp.broadcast_to(do, (b, n))
                s = jnp.where(do_rows, s_res, s)
                i = jnp.where(do_rows, i_res, i)
                est_w = jnp.where(
                    do_rows, jnp.where(alive_mask, 1.0 / alive_ct, 0.0), w
                )

            if algorithm == "RMPF":
                # ---- in-kernel rejuvenation move (sir_move_fn) ----
                u, ctr = draw(2, ctr)
                span = np.float32(2 * move_step_max + 1)
                step = jnp.floor(u[0] * span) - np.float32(move_step_max)
                i_prop = i + step
                in_support = jnp.logical_and(
                    i_prop >= 0.0, i_prop <= np.float32(n_total) - s
                )
                log_ratio = obs_logw(
                    jnp.maximum(i_prop, 0.0), y_t, lgy_t
                ) - obs_logw(i, y_t, lgy_t)
                accept = jnp.logical_and(
                    in_support, jnp.log(u[1]) < log_ratio
                )
                # Masked lanes must stay inert: an accepted move there
                # would re-activate them in the next day's Gillespie.
                accept = jnp.logical_and(accept, alive_mask)
                i = jnp.where(accept, i_prop, i)

            # ---- state estimate (Q5: uniform weights after a resample) --
            if est_w is None:
                est_w = jnp.where(alive_mask, 1.0 / alive_ct, 0.0)
            live_f = 1.0 - dead
            est_s = jnp.sum(est_w * s, axis=-1, keepdims=True) * live_f
            est_i = jnp.sum(est_w * i, axis=-1, keepdims=True) * live_f
            if "writes" not in _DEBUG_SKIP:
                ses_acc = jnp.where(est_mask, est_s, ses_acc)
                sei_acc = jnp.where(est_mask, est_i, sei_acc)
            return s, i, loglike, dead, ctr, ses_acc, sei_acc

        s, i, loglike, dead, ctr, ses_acc, sei_acc = jax.lax.fori_loop(
            0, num_obs, day, (s, i, loglike, dead, ctr, ses_acc, sei_acc)
        )
        ll_ref[:, :] = jnp.where(dead > 0.0, -jnp.inf, loglike)
        ses_ref[:, :] = ses_acc
        sei_ref[:, :] = sei_acc

    return kernel


def _batched_call(seeds, lam, gam, alive, thr, s0, i0, y, lgy, *,
                  n_static, n_total, unroll, method, always_resample,
                  interpret, algorithm="BPF", move_step_max=2,
                  selection="quadratic"):
    """seeds [C, 2] int32; lam/gam/alive/thr/s0/i0 [C] f32; y/lgy [T] f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = lam.shape[0]
    n = n_static
    num_obs = y.shape[0]
    t1 = num_obs + 1

    b = _chains_per_program(c, n, selection)
    g = -(-c // b)
    pad = g * b - c
    if pad:
        def padc(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

        seeds = padc(seeds)
        # Inert padded chains: zero rates, one alive lane, zero state.
        lam, gam = padc(lam), padc(gam)
        alive = jnp.pad(alive, (0, pad), constant_values=1.0)
        thr = jnp.pad(thr, (0, pad), constant_values=1.0)
        s0, i0 = padc(s0), padc(i0)

    kernel = _make_kernel(
        n, float(n_total), int(num_obs), int(unroll), method,
        bool(always_resample), bool(interpret), algorithm=algorithm,
        move_step_max=int(move_step_max), selection=selection,
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

    # Per-chain scalars enter as FULL [B, N] broadcasts, not [B, 1]
    # operands: Mosaic re-broadcasts a 1-lane vector on every use inside
    # the event while_loop, which measured ~2 ms/step at the bench shape
    # (scripts/profile_sweep_boundary.py); the XLA-side broadcast is a
    # cheap lane-replicating copy paid once per call.
    def col(x):
        return jnp.broadcast_to(
            x.astype(jnp.float32)[:, None], (g * b, n)
        ).reshape(g, b, n)

    def scol(x):
        return jnp.broadcast_to(x[:, None], (g * b, n)).reshape(g, b, n)

    sdim = (b, n)

    ll, ses, sei = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=(
            jax.ShapeDtypeStruct((g, b, 1), jnp.float32),
            jax.ShapeDtypeStruct((g, b, t1), jnp.float32),
            jax.ShapeDtypeStruct((g, b, t1), jnp.float32),
        ),
        in_specs=[
            whole((g, 2)),                  # per-program seeds
            whole((num_obs,)),              # y
            whole((num_obs,)),              # lgamma(y + 1)
            spec(*sdim), spec(*sdim),       # per-CHAIN seed words (int32)
            spec(*sdim), spec(*sdim), spec(*sdim), spec(*sdim),
            spec(*sdim), spec(*sdim),
        ],
        out_specs=(spec(b, 1), spec(b, t1), spec(b, t1)),
        interpret=interpret,
    )(
        seeds.reshape(g, b, 2)[:, 0, :],
        y.astype(jnp.float32),
        lgy.astype(jnp.float32),
        scol(seeds[:, 0]),
        scol(seeds[:, 1]),
        col(lam), col(gam), col(alive), col(thr), col(s0), col(i0),
    )
    ll = ll.reshape(g * b)[:c]
    ses = ses.reshape(g * b, t1)[:c]
    sei = sei.reshape(g * b, t1)[:c]
    if "stack" in _DEBUG_SKIP:  # profiling: skip the [C, T+1, 2] relayout
        return ll, ses
    return ll, jnp.stack([ses, sei], axis=-1)


@functools.lru_cache(maxsize=None)
def _make_op(n_static, n_total, unroll, method, always_resample, interpret,
             algorithm, move_step_max, selection):
    kw = dict(
        n_static=n_static, n_total=n_total, unroll=unroll, method=method,
        always_resample=always_resample, interpret=interpret,
        algorithm=algorithm, move_step_max=move_step_max,
        selection=selection,
    )

    @jax.custom_batching.custom_vmap
    def op(seeds, lam, gam, alive, thr, s0, i0, y, lgy):
        ll, se = _batched_call(
            seeds[None], lam[None], gam[None], alive[None], thr[None],
            s0[None], i0[None], y, lgy, **kw,
        )
        return ll[0], se[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, seeds, lam, gam, alive, thr, s0, i0,
              y, lgy):
        if in_batched[7] or in_batched[8]:
            raise ValueError(
                "sir_filter_sweep: y is shared across chains and cannot "
                "be vmapped"
            )

        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        args = [
            ensure(x, bt)
            for x, bt in zip(
                (seeds, lam, gam, alive, thr, s0, i0), in_batched[:7]
            )
        ]
        out = _batched_call(*args, y, lgy, **kw)
        return out, (True, True)

    return op


def sir_filter_sweep(
    key,
    y,
    num_particles,
    lam,
    gamma,
    n_total,
    init_infected,
    algorithm: str = "BPF",
    max_particles: int | None = None,
    resample_fn: str = "stratified",
    resample_algorithm: str = "SISAR",
    threshold=None,
    unroll: int = 8,
    move_step_max: int = 2,
    selection: str = "auto",
    interpret: bool = False,
):
    """Full SIR particle-filter sweep in one fused TPU kernel (vmap-aware).

    ``selection`` chooses the in-kernel resampling-selection algorithm:
    ``"quadratic"`` ([B, N, N] telescoped masked-reduce), ``"merge"``
    (O(N log N) bitonic-merge network, ops/merge_select.py; requires
    sorted positions, i.e. stratified/systematic), or ``"auto"`` —
    merge whenever positions are sorted, quadratic for multinomial.
    Round-4 measurements (scripts/particle_regime.py): merge is ~1.20x
    quadratic at the benchmark's N = 128 (register-resident roll stages
    vs VMEM-materialized [B, N, N] streams) and 3.6x at the
    Q10-reachable N = 1024, where per-particle throughput under merge
    matches N = 128 (no N^2 cliff).

    Drop-in fast path for the PMMH hot loop on the SIR model: returns
    ``(loglike, state_est [T+1, 2])`` with the same sampling distribution
    as ``bootstrap_filter`` / ``auxiliary_filter`` / ``resample_move_filter``
    over ``sir_model(...)`` under the default fresh-weight semantics
    (bit-streams differ — parity is distributional, like every RNG-bearing
    path). The APF lookahead is ``sir_aux_log_likelihood_fn`` (the Poisson
    observation density at the propagated infectious count) and the RMPF
    move is ``sir_move_fn(n_total, move_step_max)`` — the models the
    benchmark configs use. ``num_particles`` may be a traced per-chain
    count with ``max_particles`` the static lane bound (a multiple of 128,
    <= 1024). RMPF forces SISR (filters/resample_move.py:34-39 mirroring
    /root/reference/R/resample_move_filter.R:213-230).
    """
    if algorithm not in ("BPF", "APF", "RMPF"):
        raise ValueError("algorithm must be one of ('BPF', 'APF', 'RMPF')")
    if resample_algorithm not in ("SISR", "SISAR"):
        raise ValueError("sir_filter_sweep supports SISR or SISAR only")
    if resample_fn not in ("stratified", "systematic", "multinomial"):
        raise ValueError(f"unknown resample_fn {resample_fn!r}")
    if float(n_total) > _PACK - 2.0:
        raise ValueError(
            f"sir_filter_sweep requires n_total <= {int(_PACK) - 2} "
            "(packed-lane resampling bound)"
        )
    if max_particles is None:
        max_particles = int(num_particles)
    n_static = int(max_particles)
    if n_static % 128 or n_static > 1024:
        raise ValueError(
            "max_particles must be a multiple of 128 and <= 1024"
        )

    from jax.scipy.special import gammaln

    ys = jnp.asarray(y, jnp.float32).reshape(-1)
    lgy = gammaln(ys + 1.0)

    kd = jnp.ravel(jax.random.key_data(key))[:2]
    seeds = jax.lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)
    alive = jnp.asarray(num_particles, jnp.float32).reshape(())
    thr = (
        jnp.asarray(threshold, jnp.float32).reshape(())
        if threshold is not None
        else alive / 2.0
    )
    lam = jnp.asarray(lam, jnp.float32).reshape(())
    gam = jnp.asarray(gamma, jnp.float32).reshape(())
    s0 = jnp.asarray(float(n_total - init_infected), jnp.float32)
    i0 = jnp.asarray(float(init_infected), jnp.float32)

    if selection not in ("auto", "quadratic", "merge"):
        raise ValueError("selection must be 'auto', 'quadratic' or 'merge'")
    if selection == "merge" and resample_fn == "multinomial":
        raise ValueError(
            "selection='merge' requires sorted positions "
            "(stratified/systematic)"
        )
    if selection == "merge" and n_static & (n_static - 1):
        raise ValueError(
            "selection='merge' requires a power-of-two max_particles "
            f"(got {n_static}); use selection='quadratic'"
        )
    if selection == "auto":
        # Merge needs sorted positions AND a power-of-two lane count
        # (ops/merge_select.py contract).
        selection = (
            "merge"
            if resample_fn != "multinomial"
            and n_static & (n_static - 1) == 0
            else "quadratic"
        )

    always = algorithm == "RMPF" or resample_algorithm == "SISR"
    op = _make_op(
        n_static, float(n_total), int(unroll), resample_fn,
        always, bool(interpret), algorithm, int(move_step_max), selection,
    )
    return op(seeds, lam, gam, alive, thr, s0, i0, ys, lgy)


def sir_bpf_sweep(key, y, num_particles, lam, gamma, n_total, init_infected,
                  **kw):
    """Bootstrap-filter specialization of :func:`sir_filter_sweep`."""
    return sir_filter_sweep(
        key, y, num_particles, lam, gamma, n_total, init_infected,
        algorithm="BPF", **kw,
    )

"""O(N log N) inverse-CDF selection via bitonic merge (lane-roll network).

The fused kernels' selection step answers, for every output slot k with
sorted query position ``pos_k``, the inverse-CDF lookup
``m_k = #{j : cdf_j <= pos_k}`` and returns the packed particle value
``v[m_k]``. The [B, N, N] masked-reduce formulation
(ops/sir_sweep_pallas.py, ops/resampling_pallas.py) costs 3 VPU ops per
selection ELEMENT — O(N^2) work that cliffs at the Q10-reachable
N = 1024 (64x the benchmark's N = 128 selection work per chain).

This module computes the same selection in O(N log N) lane-roll stages,
exploiting that BOTH sequences are sorted (the running-max CDF by
construction; stratified/systematic positions by definition — multinomial
positions are NOT sorted, so the quadratic path keeps serving that
method):

  1. Keys become int32 by monotone bitcast (IEEE non-negative floats
     compare like their bit patterns); the LSB carries the cdf-vs-pos
     tie-break (cdf keys even, pos keys odd, so a ``cdf_j == pos_k`` tie
     sorts the cdf element first, matching ``<=``).
  2. Equal-cdf runs (zero-weight lanes under the running-max CDF) are
     pre-resolved IN ORIGINAL ORDER by a backward copy-scan
     (:func:`resolve_carries`): every member of an equal run carries the
     value of the run's LAST member. Any permutation of equal keys
     inside the merge network is then harmless — permuted elements carry
     identical values — which removes the need for a stability
     tie-break column.
  3. A bitonic MERGE (log2(2N) compare-exchange stages; the partner at
     XOR distance d is fetched with two cyclic ``pltpu.roll``s) sorts
     the concatenation [cdf ascending | pos reversed-descending]. Each
     stage's swap mask is recorded; a compare-exchange is a pairwise
     transposition, hence an involution.
  4. A copy-forward scan (associative "latest cdf value so far"
     operator — COPIES, never sums, so there are no f32
     accumulation-order hazards) gives every pos element the carried
     value of the nearest preceding cdf element, which is ``v[m_k]``.
  5. The merge stages replay in REVERSE with their recorded masks
     (involution => same selects route results back to pre-merge
     lanes); a final XOR-complement reversal restores output-slot
     order. Slots preceded by NO cdf element fall back to ``v[0]``.

Exactness: every transported quantity is copied, never accumulated, so
the result is bit-identical to the O(N^2) telescoped selection for the
same (cdf, pos, v) inputs (pinned in tests/test_merge_select.py).

CONTRACT — N must be a POWER OF TWO. The XOR-distance partner network
and the ``lane & d`` bit tests are only meaningful when every stage
distance d is a bit of the lane index; composite lane counts such as
384 (valid under a bare "multiple of 128" check) silently route wrong
partners. Callers gate on ``n & (n - 1) == 0``: the wrappers in
ops/resampling_pallas.py and filters/core.py fall back to the quadratic
masked-reduce, the sweep builder requires a power-of-two
``max_particles``, and pmmh() pads its tuned particle bound to the next
power of two (pinned in tests/test_merge_select.py::TestNonPowerOfTwo).

Masks are int32 (0/1), not bool: Mosaic's lane rotates are exercised on
int32/f32 only. Written with jnp ops + a ``roll_fn`` parameter so the
same body runs inside a Pallas TPU kernel (``pltpu.roll``) and under
plain XLA on CPU (:func:`xla_roll`) for tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "merge_select",
    "merge_select_cols",
    "resolve_carries",
    "xla_roll",
]


def xla_roll(x, shift, axis=1):
    """Cyclic roll matching pltpu.roll semantics: out[L] = x[L - shift]."""
    return jnp.roll(x, shift, axis=axis)


def _partner(x, lower_i, d, two_n, roll_fn):
    """Value at each lane's XOR-d partner (lower lanes read L+d)."""
    return jnp.where(
        lower_i > 0, roll_fn(x, two_n - d), roll_fn(x, d)
    )


def resolve_carries(cdf_ext, v_next, lane, roll_fn=xla_roll):
    """Per cdf element: the value queries in ITS bucket select, resolved
    across equal-cdf runs in original order.

    ``v_next[j] = v[j + 1]`` (the particle chosen when a position lands
    strictly above ``cdf_j``; lane N-1's entry is never consumed — the
    sentinel-pinned cdf tail exceeds every position). For an equal run
    ``cdf_j == ... == cdf_m < cdf_{m+1}`` every member must carry
    ``v_next[m]`` — a backward copy-scan over "strictly increases after
    me" break flags.
    """
    n = cdf_ext.shape[1]
    nxt = roll_fn(cdf_ext, n - 1)                  # lane j reads cdf[j+1]
    brk = jnp.logical_or(cdf_ext < nxt, lane == n - 1).astype(jnp.int32)
    carry = jnp.where(brk > 0, v_next, 0.0)
    have = brk
    shift = 1
    while shift < n:
        in_range = (lane < n - shift).astype(jnp.int32)
        rolled_have = roll_fn(have, n - shift) * in_range
        rolled_carry = roll_fn(carry, n - shift)
        carry = jnp.where(have > 0, carry, rolled_carry)
        have = jnp.maximum(have, rolled_have)
        shift *= 2
    return carry


def _xor_reverse(x, lane, roll_fn):
    """Reverse along lanes via XOR-complement exchanges (N power of 2).

    reverse(L) = L XOR (N-1): compose the full-swap XOR-d exchange for
    every bit d — two rolls + a select each, the same machinery as the
    merge stages (lax.rev is unavailable under Mosaic).
    """
    n = x.shape[1]
    d = 1
    while d < n:
        upper_from = roll_fn(x, n - d)             # lane L reads L + d
        lower_from = roll_fn(x, d)                 # lane L reads L - d
        x = jnp.where((lane & d) == 0, upper_from, lower_from)
        d *= 2
    return x


def merge_select_cols(cdf_ext, pos, carries, v0s, lane, roll_fn=xla_roll):
    """Inverse-CDF selection in O(N log N) roll stages (module docstring),
    routing any number of value columns through ONE shared key network.

    Args:
      cdf_ext: [B, N] non-decreasing CDF, pinned to a finite sentinel
        STRICTLY between 1.0 and 2.0 (1.5) from the last alive lane on:
        it must exceed every position, and floats >= 2.0 bitcast-shift
        into the int32 sign bit.
      pos: [B, N] sorted non-decreasing query positions in [0, 1.5)
        (stratified/systematic; dead slots pinned 1.0).
      carries: tuple of [B, N] columns from :func:`resolve_carries`.
      v0s: tuple of [B, 1] fallbacks for slots with no preceding cdf
        element (each column's v[0]).
      lane: [B, N] int32 lane iota.
      roll_fn: cyclic rotate (pltpu.roll in-kernel; xla_roll on CPU).

    Returns:
      tuple of [B, N] selected values ``v[m_k]`` per column.
    """
    b, n = cdf_ext.shape
    two_n = 2 * n

    ikey_cdf = jax.lax.bitcast_convert_type(cdf_ext, jnp.int32) << 1
    ikey_pos = (jax.lax.bitcast_convert_type(pos, jnp.int32) << 1) | 1

    lane2 = jnp.concatenate([lane, lane + n], axis=1)
    key = jnp.concatenate(
        [ikey_cdf, _xor_reverse(ikey_pos, lane, roll_fn)], axis=1
    )
    vals = [
        jnp.concatenate([c, jnp.zeros_like(c)], axis=1) for c in carries
    ]

    # ---- bitonic merge, masks recorded ----
    masks = []
    d = n
    while d >= 1:
        lower_i = ((lane2 & d) == 0).astype(jnp.int32)
        pkey = _partner(key, lower_i, d, two_n, roll_fn)
        # swap = lower ? (key > pkey) : (key < pkey), in int arithmetic:
        # a select between two BOOLEAN branches lowers to an i8->i1
        # truncation Mosaic rejects. NOT simply (key > pkey) == lower —
        # equal keys must swap on NEITHER side (pair consistency).
        gt_i = (key > pkey).astype(jnp.int32)
        lt_i = (key < pkey).astype(jnp.int32)
        swap = lower_i * gt_i + (1 - lower_i) * lt_i
        key = jnp.where(swap > 0, pkey, key)
        vals = [
            jnp.where(swap > 0, _partner(v, lower_i, d, two_n, roll_fn), v)
            for v in vals
        ]
        masks.append(swap)
        d //= 2

    # ---- copy-forward scan: latest cdf-carried value at or before L ----
    is_cdf = ((key & 1) == 0).astype(jnp.int32)
    have = is_cdf
    ress = [jnp.where(is_cdf > 0, v, 0.0) for v in vals]
    shift = 1
    while shift < two_n:
        in_range = (lane2 >= shift).astype(jnp.int32)
        rolled_have = roll_fn(have, shift) * in_range
        ress = [
            jnp.where(have > 0, r, roll_fn(r, shift)) for r in ress
        ]
        have = jnp.maximum(have, rolled_have)
        shift *= 2

    # ---- unmerge: replay transposition stages in reverse ----
    d = 1
    while d <= n:
        swap = masks.pop()
        lower_i = ((lane2 & d) == 0).astype(jnp.int32)
        ress = [
            jnp.where(
                swap > 0, _partner(r, lower_i, d, two_n, roll_fn), r
            )
            for r in ress
        ]
        have = jnp.where(
            swap > 0, _partner(have, lower_i, d, two_n, roll_fn), have
        )
        d *= 2

    got = _xor_reverse(have[:, n:], lane, roll_fn)
    return tuple(
        jnp.where(got > 0, _xor_reverse(r[:, n:], lane, roll_fn), v0)
        for r, v0 in zip(ress, v0s)
    )


def merge_select(cdf_ext, pos, v_carry, v0, lane, roll_fn=xla_roll):
    """Single-column :func:`merge_select_cols`."""
    return merge_select_cols(
        cdf_ext, pos, (v_carry,), (v0,), lane, roll_fn
    )[0]

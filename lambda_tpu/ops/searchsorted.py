"""Batched masked binary search over the sorted suffix-prefix key index.

This is the device-side replacement for FM-index cursor operations
(``/root/reference/src/search_algo.hpp:486-534`` search_impl,
``:679-726`` adaptive elongation): a "cursor" is a half-open range
[lo, hi) of rows in the sorted key array whose keys start with a given
character prefix; extending the cursor right = re-searching within the
range with one more character.

Everything is vectorized over thousands of (seed, variant) cursors at
once: each binary-search step is one gather per key word, so a full
lookup costs ~32 * words gathers regardless of cursor count — ideal for
the TPU's wide vector units, with zero data-dependent branching.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# numpy scalar, NOT jnp: a module-level device scalar would be
# captured as a traced-constant in every jit and force a blocking
# device sync at trace time
UINT32_MAX = np.uint32(0xFFFFFFFF)


def length_masks(lengths: jnp.ndarray, bits: int, cpw: int, words: int) -> jnp.ndarray:
    """Per-word masks selecting the first ``lengths`` characters of a key.

    lengths: (...,) int32 prefix lengths in characters.
    Returns (..., words) uint32 masks (chars are packed MSB-first,
    left-aligned: char k of word w occupies bits [32-(k+1)*bits, 32-k*bits)).
    """
    w_idx = jnp.arange(words, dtype=jnp.int32)
    used = jnp.clip(lengths[..., None] - w_idx * cpw, 0, cpw)  # (..., words)
    shift = (32 - used * bits).astype(jnp.uint32)
    full = jnp.left_shift(UINT32_MAX, shift)  # undefined for shift==32 -> guard
    return jnp.where(used > 0, full, jnp.uint32(0))


def _masked_cmp(key_words, target_words, masks):
    """Lexicographic compare of masked keys against (pre-masked) targets.

    key_words/target_words/masks: (..., words) uint32.
    Returns (lt, eq) booleans of shape (...,).
    """
    kw = key_words & masks
    lt_w = kw < target_words
    eq_w = kw == target_words
    # lexicographic reduce over the word axis
    lt = jnp.zeros(kw.shape[:-1], dtype=bool)
    eq = jnp.ones(kw.shape[:-1], dtype=bool)
    for w in range(kw.shape[-1]):
        lt = lt | (eq & lt_w[..., w])
        eq = eq & eq_w[..., w]
    return lt, eq


def _gather_keys(keys: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """keys: (P, words) uint32; idx: (N,) int32 -> (N, words)."""
    return keys[idx]


@functools.partial(jax.jit, static_argnames=("n_steps", "bucket_shift"))
def search_range(keys: jnp.ndarray, targets: jnp.ndarray, masks: jnp.ndarray,
                 lo0: jnp.ndarray, hi0: jnp.ndarray, n_steps: int,
                 bucket: jnp.ndarray | None = None,
                 bucket_shift: int | None = None):
    """Find, within initial ranges [lo0, hi0), the subrange of rows whose
    masked keys equal ``targets``.

    keys:    (P, words) uint32 sorted rows
    targets: (N, words) uint32, zero beyond the prefix
    masks:   (N, words) uint32 prefix masks
    lo0/hi0: (N,) int32 initial range (pass 0/P for a full search)
    n_steps: static UPPER BOUND on bisection steps (ceil(log2(P))+1);
             the loop exits as soon as every range has converged, so a
             caller that passes already-narrow [lo0, hi0) (the adaptive
             elongation re-search) pays only the steps it needs.
    bucket/bucket_shift: optional first-word prefix bucket table (see
             ``prefix_table``): ``bucket[p]`` is the first row whose
             word-0 top bits equal p (p = word0 >> bucket_shift).  For
             every target whose mask covers the bucketed prefix the
             initial range is intersected with its bucket, cutting the
             realized bisection depth to ~log2(max bucket size).

    Returns (lo, hi): (N,) int32 each; hi - lo is the occurrence count.
    The result is step-count-invariant (extra bisection steps are
    no-ops), so the dynamic exit cannot change output bytes.
    """

    # anchor the carries to the inputs' device-variance (vma) so the loop
    # carry type is stable under shard_map (value is unchanged: x | 0)
    anchor = (keys[0, 0] & jnp.uint32(0)).astype(jnp.int32) + \
             (targets[..., 0] & jnp.uint32(0)).astype(jnp.int32)
    lo0 = lo0 + anchor
    hi0 = hi0 + anchor

    if bucket is not None and bucket_shift is not None:
        full = jnp.uint32((0xFFFFFFFF << bucket_shift) & 0xFFFFFFFF
                          if bucket_shift < 32 else 0)
        usable = (masks[..., 0] & full) == full
        pfx = (targets[..., 0] >> np.uint32(bucket_shift)).astype(jnp.int32)
        blo = bucket[pfx]
        bhi = bucket[pfx + 1]
        lo0 = jnp.where(usable, jnp.maximum(lo0, blo), lo0)
        hi0 = jnp.where(usable, jnp.minimum(hi0, bhi), hi0)
        hi0 = jnp.maximum(hi0, lo0)

    def step(st):
        i, lo_l, hi_l, lo_u, hi_u = st
        # lower bound: first row >= target
        mid = lo_l + ((hi_l - lo_l) >> 1)
        kw = _gather_keys(keys, mid)
        lt, _ = _masked_cmp(kw, targets, masks)
        open_l = lo_l < hi_l
        go = open_l & lt
        lo_l = jnp.where(go, mid + 1, lo_l)
        hi_l = jnp.where(open_l & ~lt, mid, hi_l)
        # upper bound: first row > target
        mid = lo_u + ((hi_u - lo_u) >> 1)
        kw = _gather_keys(keys, mid)
        lt, eq = _masked_cmp(kw, targets, masks)
        leq = lt | eq
        open_u = lo_u < hi_u
        go = open_u & leq
        lo_u = jnp.where(go, mid + 1, lo_u)
        hi_u = jnp.where(open_u & ~leq, mid, hi_u)
        return i + 1, lo_l, hi_l, lo_u, hi_u

    def more(st):
        i, lo_l, hi_l, lo_u, hi_u = st
        return (i < n_steps) & (jnp.any(lo_l < hi_l) | jnp.any(lo_u < hi_u))

    _, lo, _, _, hi = jax.lax.while_loop(
        more, step, (jnp.int32(0), lo0, hi0, lo0, hi0))
    return lo, hi


def pick_bucket_m(bits: int, cpw: int, n_rows: int) -> int:
    """Largest first-word prefix length m (chars) whose bucket table
    (2^(bits*m)+1 int32 entries) stays within ~16x the row count and a
    16 Mi-entry cap (64 MB — ~2.5% of a 10^8-position index's device
    bytes).  A sparser table than rows means most dead seed variants hit
    an EMPTY bucket and converge before the first bisection step, and
    abundant-prefix buckets shrink ~16x (round 5; the previous 4 Mi /
    4x cap left ~100-row average buckets at 10^8 positions)."""
    cap = min(1 << 24, max(4096, 16 * max(n_rows, 1)))
    m = 0
    while m < cpw and (1 << (bits * (m + 1))) <= cap:
        m += 1
    return m


def prefix_table(keys_word0: np.ndarray, bits: int, m: int) -> np.ndarray:
    """Host-side bucket table over the top ``m`` packed characters of
    word 0 of the SORTED key rows: entry p = index of the first row
    whose word-0 top bits equal p; entry 2^(bits*m) = n_rows.  Rows
    padded with 0xFFFFFFFF (sharded stacking) fall in the last buckets
    and never intersect a real target's bucket."""
    shift = np.uint32(32 - bits * m)
    pfx = (keys_word0.astype(np.uint32) >> shift).astype(np.int64)
    counts = np.bincount(pfx, minlength=1 << (bits * m))
    table = np.zeros((1 << (bits * m)) + 1, dtype=np.int32)
    table[1:] = np.cumsum(counts).astype(np.int32)
    return table


def steps_for(num_rows: int) -> int:
    n = 1
    while (1 << n) < num_rows + 1:
        n += 1
    return n + 1

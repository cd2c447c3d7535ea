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


@functools.partial(jax.jit, static_argnames=("n_steps",))
def search_range(keys: jnp.ndarray, targets: jnp.ndarray, masks: jnp.ndarray,
                 lo0: jnp.ndarray, hi0: jnp.ndarray, n_steps: int):
    """Find, within initial ranges [lo0, hi0), the subrange of rows whose
    masked keys equal ``targets``.

    keys:    (P, words) uint32 sorted rows
    targets: (N, words) uint32, zero beyond the prefix
    masks:   (N, words) uint32 prefix masks
    lo0/hi0: (N,) int32 initial range (pass 0/P for a full search)
    n_steps: static number of bisection steps (ceil(log2(P))+1)

    Returns (lo, hi): (N,) int32 each; hi - lo is the occurrence count.
    """

    # anchor the carries to the inputs' device-variance (vma) so the loop
    # carry type is stable under shard_map (value is unchanged: x | 0)
    anchor = (keys[0, 0] & jnp.uint32(0)).astype(jnp.int32) + \
             (targets[..., 0] & jnp.uint32(0)).astype(jnp.int32)
    lo0 = lo0 + anchor
    hi0 = hi0 + anchor

    def lb_body(_, state):
        lo, hi = state
        mid = lo + ((hi - lo) >> 1)
        kw = _gather_keys(keys, mid)
        lt, _ = _masked_cmp(kw, targets, masks)
        go_right = (lo < hi) & lt
        return jnp.where(go_right, mid + 1, lo), jnp.where((lo < hi) & ~lt, mid, hi)

    def ub_body(_, state):
        lo, hi = state
        mid = lo + ((hi - lo) >> 1)
        kw = _gather_keys(keys, mid)
        lt, eq = _masked_cmp(kw, targets, masks)
        leq = lt | eq
        go_right = (lo < hi) & leq
        return jnp.where(go_right, mid + 1, lo), jnp.where((lo < hi) & ~leq, mid, hi)

    lo = jax.lax.fori_loop(0, n_steps, lb_body, (lo0, hi0))[0]
    hi = jax.lax.fori_loop(0, n_steps, ub_body, (lo0, hi0))[0]
    return lo, hi


def steps_for(num_rows: int) -> int:
    n = 1
    while (1 << n) < num_rows + 1:
        n += 1
    return n + 1

"""Seed k-mer packing and approximate-seed variant enumeration (device).

Replaces the reference's FM-index seed search modes
(``/root/reference/src/search_algo.hpp:484-604``):

* exact seeds            -> pack the window, one binary search
* half-exact, delta<=1   -> enumerate the identity + every single-char
  substitution in the second half (the backtracking tree of
  searchHalfExactImpl enumerates exactly these distinct strings)
* full delta<=1          -> substitutions at any position
  (search_one_error / search_pseudo equivalents)

Variants that would duplicate the identity string (replacement equals the
original character) are masked invalid so no hit is reported twice.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pack_prefix(chars: jnp.ndarray, lengths: jnp.ndarray,
                bits: int, cpw: int, words: int) -> jnp.ndarray:
    """Pack 0-based ranks into sorted-key format (rank+1, MSB-first,
    left-aligned, 0 past ``lengths``).

    chars: (..., Lmax) int32; lengths: (...,) int32  ->  (..., words) uint32
    """
    Lmax = chars.shape[-1]
    out = jnp.zeros(chars.shape[:-1] + (words,), dtype=jnp.uint32)
    j_valid = jnp.arange(Lmax, dtype=jnp.int32)
    vals = jnp.where(j_valid < lengths[..., None], chars + 1, 0).astype(jnp.uint32)
    for j in range(min(Lmax, cpw * words)):
        w = j // cpw
        sh = np.uint32(32 - ((j % cpw) + 1) * bits)
        out = out.at[..., w].add(jnp.left_shift(vals[..., j], sh))
    return out


def append_char(targets: jnp.ndarray, lengths: jnp.ndarray, newchar: jnp.ndarray,
                bits: int, cpw: int, words: int) -> jnp.ndarray:
    """Append one character to packed prefixes (cursor.extendRight).

    targets: (..., words) uint32; lengths: (...,) current char counts;
    newchar: (...,) 0-based ranks.  Returns new targets; caller tracks
    lengths+1.  Positions beyond capacity are silently dropped (callers
    must cap extension at the key capacity).
    """
    L = lengths
    w_of = L // cpw
    sh = (32 - ((L % cpw) + 1) * bits).astype(jnp.uint32)
    contrib = jnp.left_shift((newchar + 1).astype(jnp.uint32), sh)
    w_idx = jnp.arange(words, dtype=jnp.int32)
    add = jnp.where((w_idx == w_of[..., None]) & (L[..., None] < cpw * words),
                    contrib[..., None], jnp.uint32(0))
    return targets + add


def variant_table(k: int, delta: int, alphabet_size: int, half_exact: bool):
    """Static variant spec for <=delta substitutions.

    Returns (positions, replacements) int32 arrays of shape (V,), where
    position -1 denotes the identity variant.  Only delta<=1 is supported
    by enumeration; the caller handles delta==0 as exact search.
    """
    if delta == 0:
        return np.array([-1], dtype=np.int32), np.array([0], dtype=np.int32)
    if delta != 1:
        raise ValueError(
            f"variant enumeration only supports delta <= 1 (got {delta}); "
            "delta >= 2 uses pigeonhole seeding (see search/seeding.py)")
    start = k // 2 if half_exact else 0  # errors only in 2nd half (hpp:555)
    pos, rep = [-1], [0]
    for p in range(start, k):
        for r in range(alphabet_size):
            pos.append(p)
            rep.append(r)
    return np.array(pos, dtype=np.int32), np.array(rep, dtype=np.int32)


def make_variants(seed_chars: jnp.ndarray, positions: np.ndarray,
                  replacements: np.ndarray):
    """Expand seeds (N, k) into variants (N, V, k) plus a validity mask
    (N, V).  A substitution variant is invalid when it equals the identity
    (replacement == original char)."""
    pos = jnp.asarray(positions)  # (V,)
    rep = jnp.asarray(replacements)
    k = seed_chars.shape[-1]
    j = jnp.arange(k, dtype=jnp.int32)
    sel = j[None, :] == pos[:, None]  # (V, k)
    expanded = jnp.where(sel[None, :, :], rep[None, :, None],
                         seed_chars[:, None, :])
    is_identity = pos < 0
    orig_at_pos = jnp.take_along_axis(
        seed_chars, jnp.maximum(pos, 0)[None, :].repeat(seed_chars.shape[0], 0),
        axis=1)  # (N, V)
    valid = is_identity[None, :] | (orig_at_pos != rep[None, :])
    return expanded, valid


def pigeon_chunks(k: int, delta: int):
    """Pigeonhole partition of a k-length seed into delta+1 chunks
    (search-scheme ``pigeon_opt`` equivalent: any occurrence with <=delta
    mismatches matches at least one chunk exactly).

    Returns (offsets, lengths) int32 arrays of shape (delta+1,); longer
    chunks come first (remainder distributed to the leading chunks).
    """
    parts = delta + 1
    base = k // parts
    lens = [base + (1 if i < k % parts else 0) for i in range(parts)]
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    return offs, np.array(lens, dtype=np.int32)

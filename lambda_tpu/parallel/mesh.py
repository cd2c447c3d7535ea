"""Multi-chip scale-out: database sharding + data-parallel query batches
over a ``jax.sharding.Mesh``.

The reference is single-node OpenMP (``/root/reference/src/search.cpp:379``)
with a shared read-only index; its TPU-native scale-out (SURVEY.md §2.2 P7)
is designed here instead of translated:

* mesh axes: ``q`` (query data parallelism) x ``db`` (database shards)
* every ``db`` shard holds its own sorted k-mer index over a contiguous
  slice of subject frames (built by :func:`shard_index`), so all stage-1/2
  row spaces are shard-local; emitted hits carry *global* frame ids
* queries are replicated along ``db`` and sharded along ``q``; per-shard
  hit lists ride ICI collectives: scores are merged with a top-k over an
  ``all_gather`` along ``db``
* scalar statistics (dbTotalLength for e-values; search_algo.hpp:317-319)
  are a ``psum`` over shards

These are PRODUCTION paths: the CLI pipeline drives
``shard_loaded_index``/``shard_prebuilt_index``, ``make_sharded_seeder``
and ``make_sharded_band_scorer`` whenever ``--db-shards``/``--q-shards``
exceed 1 (pipeline.SearchContext), and ``sharded_search_step`` is the
fused demo step the multi-chip dry run and benchmarks exercise.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import alphabets as ab
from ..index.build import KmerIndex, build_kmer_index
from ..ops import kmer as kmer_ops, searchsorted as ss, sw_xla
from ..search import seeding


def shard_index(red_frames: list[np.ndarray], alphabet_size: int,
                n_shards: int, words: int = 4):
    """Split frames into ``n_shards`` contiguous groups and build one
    k-mer index per shard.  Returns per-shard (KmerIndex, frame_base,
    local_offsets) with padded, equal row counts so the stack can be
    device-sharded."""
    from .. import frames as fr

    groups = np.array_split(np.arange(len(red_frames)), n_shards)
    shards = []
    for g in groups:
        frames_g = [red_frames[i] for i in g]
        concat, offsets, _ = fr.concat_frames(frames_g)
        idx = build_kmer_index(concat, offsets, alphabet_size, words=words)
        base = int(g[0]) if len(g) else 0
        shards.append((idx, base, offsets))
    return shards


def stack_shards(shards):
    """Pad each shard's arrays to the max row count and stack into
    (n_shards, ...) arrays ready for jax.device_put with a 'db' sharding.

    Padded key rows are all-0xFF so no real prefix can match them; padded
    rows never enter [lo, hi) ranges because the searches are bounded by
    per-shard row counts."""
    n = len(shards)
    pmax = max(s[0].num_positions for s in shards)
    words = shards[0][0].words
    keys = np.full((n, pmax, words), 0xFFFFFFFF, dtype=np.uint32)
    pos = np.zeros((n, pmax), dtype=np.int32)
    frame = np.zeros((n, pmax), dtype=np.int32)
    rows = np.zeros((n,), dtype=np.int32)
    for i, (idx, fb, _loc_offs) in enumerate(shards):
        p = idx.num_positions
        keys[i, :p] = idx.keys
        pos[i, :p] = idx.pos.astype(np.int32)
        # translate local frame id -> global
        frame[i, :p] = idx.frame.astype(np.int32) + fb
        rows[i] = p
    return dict(keys=keys, pos=pos, frame=frame, rows=rows)


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration of the fused sharded search step."""

    seed_length: int = 11
    seed_offset: int = 3
    alphabet_size: int = 10
    bits: int = 4
    cpw: int = 8
    words: int = 4
    seeds_per_query: int = 16
    occ_cap: int = 8          # located hits kept per seed
    window: int = 64          # subject window for banded SW
    top_k: int = 8            # merged hits per query


def make_sharded_search_step(mesh: Mesh, cfg: StepConfig, n_rows_padded: int):
    """Build the jitted multi-device search step.

    Inputs (global shapes):
      red_q:   (Q, L) int32 reduced queries       -> sharded P('q', None)
      trans_q: (Q, L) int32 translated queries    -> sharded P('q', None)
      keys:    (D, Pmax, W) uint32                -> sharded P('db', None, None)
      pos:     (D, Pmax) int32                    -> sharded P('db', None)
      rows:    (D,) int32                         -> sharded P('db')
      sbj:     (D, S) int32 translated subject concat -> P('db', None)
      subst:   (A+1, A+1) int32 (PAD-extended)    -> replicated
    Output: per-query top-k scores merged across db shards,
      (Q, top_k) int32 -> P('q', None); plus global db length (psum).
    """
    n_steps = ss.steps_for(n_rows_padded)
    k = cfg.seed_length

    def local_step(red_q, trans_q, keys, pos, rows, sbj, sbj_len, subst):
        # shard-local shapes: red_q (Qs, L), keys (1, Pmax, W), ...
        keys = keys[0]
        pos = pos[0]
        n_rows = rows[0]
        sbj = sbj[0]
        sbj_len = sbj_len[0]
        Qs, L = red_q.shape

        # --- seeds every seed_offset positions (fixed schedule)
        starts = (jnp.arange(cfg.seeds_per_query, dtype=jnp.int32)
                  * cfg.seed_offset)  # (T,)
        idx2 = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        chars = red_q[:, jnp.clip(idx2, 0, L - 1)]  # (Qs, T, k)
        tgt = kmer_ops.pack_prefix(
            chars, jnp.full((Qs, cfg.seeds_per_query), k, jnp.int32),
            cfg.bits, cfg.cpw, cfg.words)
        msk = ss.length_masks(
            jnp.full((Qs, cfg.seeds_per_query), k, jnp.int32),
            cfg.bits, cfg.cpw, cfg.words)
        S = Qs * cfg.seeds_per_query
        lo, hi = ss.search_range(
            keys, tgt.reshape(S, cfg.words), msk.reshape(S, cfg.words),
            jnp.zeros(S, jnp.int32), jnp.full(S, n_rows, jnp.int32), n_steps)
        count = jnp.minimum(hi - lo, cfg.occ_cap)

        # --- locate (fixed occ per seed)
        occ = jnp.arange(cfg.occ_cap, dtype=jnp.int32)
        rowsel = jnp.clip(lo[:, None] + occ[None, :], 0, keys.shape[0] - 1)
        hit_valid = occ[None, :] < count[:, None]
        hit_pos = pos[rowsel]  # (S, occ) local concat positions

        # --- banded-window SW around each hit diagonal (MXU/VPU work)
        qi = jnp.arange(S, dtype=jnp.int32) // cfg.seeds_per_query
        sstart = jnp.maximum(hit_pos - (starts[None, :]
                             .repeat(Qs, 0).reshape(S)[:, None]) - 8, 0)
        W = cfg.window
        widx = sstart[:, :, None] + jnp.arange(W, dtype=jnp.int32)[None, None, :]
        swin = sbj[jnp.clip(widx, 0, sbj.shape[0] - 1)]  # (S, occ, W)
        pad = subst.shape[0] - 1
        swin = jnp.where(widx < sbj_len, swin, pad)
        qwin = trans_q[qi]  # (S, L)
        B = S * cfg.occ_cap
        scores, _, _ = sw_xla.sw_score_batch(
            jnp.repeat(qwin, cfg.occ_cap, axis=0).reshape(B, L),
            swin.reshape(B, W), subst, -12, -1)
        scores = jnp.where(hit_valid.reshape(B), scores, 0)
        scores = scores.reshape(Qs, cfg.seeds_per_query * cfg.occ_cap)

        # per-query local top-k, then merge across db shards
        local_top = jax.lax.top_k(scores, cfg.top_k)[0]  # (Qs, top_k)
        gathered = jax.lax.all_gather(local_top, "db", axis=1, tiled=True)
        merged = jax.lax.top_k(gathered, cfg.top_k)[0]
        # post-gather values are identical on every 'db' member; pmax marks
        # the replication for shard_map's output-spec check
        merged = jax.lax.pmax(merged, "db")

        # global database length for e-values: scalar psum over shards
        db_total = jax.lax.psum(sbj_len, "db")
        return merged, jnp.broadcast_to(db_total, (Qs, 1))

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("q", None), P("q", None),
                  P("db", None, None), P("db", None), P("db"),
                  P("db", None), P("db"), P(None, None)),
        out_specs=(P("q", None), P("q", None)),
    )
    return jax.jit(step)


def make_demo_inputs(cfg: StepConfig, n_q: int, q_len: int, db_seq_len: int,
                     n_db_frames: int, seed: int = 0):
    """Synthetic protein-like inputs for the dry run / benchmarks."""
    rng = np.random.default_rng(seed)
    A = cfg.alphabet_size
    frames = [rng.integers(0, A, size=db_seq_len).astype(np.uint8)
              for _ in range(n_db_frames)]
    red_q = rng.integers(0, A, size=(n_q, q_len)).astype(np.int32)
    # plant exact matches so the pipeline finds real hits
    for i in range(min(n_q, n_db_frames)):
        f = frames[i % n_db_frames]
        off = rng.integers(0, max(1, len(f) - q_len))
        red_q[i, :] = f[off : off + q_len]
    trans_q = red_q.copy()
    subst = np.full((A, A), -2, dtype=np.int32)
    np.fill_diagonal(subst, 4)
    return frames, red_q, trans_q, sw_xla.extend_matrix(subst)


# ---------------------------------------------------------------------------
# Sharded seeding with the REAL pipeline seeder (search/seeding.py) under
# shard_map: each 'db' member runs the fused seed->compact->locate->prescore
# program over its local index slice; the fixed-size hit arrays are gathered
# and combined on the host.  With adaptive seeding off and no buffer
# overflows this produces exactly the single-device hit set (tested); with
# adaptive seeding on, the desiredOccs feedback sees per-shard counts (the
# reference has the analogous nondeterminism across OpenMP threads).
# ---------------------------------------------------------------------------


def shard_loaded_index(kmer: KmerIndex, trans_concat: np.ndarray,
                       red_concat: np.ndarray, offsets: np.ndarray,
                       lengths: np.ndarray, n_shards: int,
                       frames_per_subject: int = 1):
    """Derive per-shard index slices from an already-sorted k-mer index.

    Subjects (groups of ``frames_per_subject`` consecutive frames) are
    split contiguously over shards — never splitting a subject, which
    also keeps frame-id parity intact for the bisulfite fwd/rev matrix
    selection.  Because the global rows are sorted and a stable filter
    preserves order, each shard's rows are simply the global rows whose
    frame falls in its range: no re-sort, no re-pack.

    Returns stacked, padded arrays on a leading 'db' axis; frame ids and
    concat positions are LOCAL to the shard (host adds ``base`` back).
    """
    fps = max(1, frames_per_subject)
    F = len(offsets) - 1
    n_subj = F // fps
    groups = np.array_split(np.arange(n_subj), n_shards)
    frame_global = kmer.frame.astype(np.int64)
    per = []
    prev_hi = 0
    for g in groups:
        # empty shards inherit the running boundary so the per-shard
        # frame bases stay MONOTONE (the extension pass assigns matches
        # to shards by searchsorted over these bases)
        f_lo = int(g[0]) * fps if len(g) else prev_hi
        f_hi = (int(g[-1]) + 1) * fps if len(g) else prev_hi
        prev_hi = f_hi
        mask = (frame_global >= f_lo) & (frame_global < f_hi)
        p_lo = int(offsets[f_lo]) if f_hi > f_lo else 0
        p_hi = int(offsets[f_hi]) if f_hi > f_lo else 0
        per.append(dict(
            keys=kmer.keys[mask],
            pos=(kmer.pos[mask].astype(np.int64) - p_lo).astype(np.int32),
            frame=(frame_global[mask] - f_lo).astype(np.int32),
            offsets=(offsets[f_lo:f_hi] - p_lo).astype(np.int32)
                if f_hi > f_lo else np.zeros(0, np.int32),
            lengths=lengths[f_lo:f_hi].astype(np.int32),
            trans=trans_concat[p_lo:p_hi].astype(np.int8),
            red=red_concat[p_lo:p_hi].astype(np.int8),
            base=f_lo,
        ))

    return _stack_shard_dicts(per, kmer.words)


def shard_prebuilt_index(idx, red_concat: np.ndarray):
    """Stack the per-shard arrays of a SHARDED ARTIFACT (mkindex
    --shards; index/artifact.py) for device placement — the shards were
    built per subject range, so no global filter/re-sort is needed and
    the host never materializes the merged key array."""
    fb = idx.shard_frame_bounds()
    offsets = idx.trans_offsets
    lengths = idx.trans_lengths
    per = []
    for k, sh in enumerate(idx.kmer_shards):
        f_lo, f_hi = int(fb[k]), int(fb[k + 1])
        p_lo = int(offsets[f_lo]) if f_hi > f_lo else 0
        p_hi = int(offsets[f_hi]) if f_hi > f_lo else 0
        per.append(dict(
            keys=sh.keys,
            pos=sh.pos.astype(np.int32),
            frame=sh.frame.astype(np.int32),
            offsets=(offsets[f_lo:f_hi] - p_lo).astype(np.int32)
                if f_hi > f_lo else np.zeros(0, np.int32),
            lengths=lengths[f_lo:f_hi].astype(np.int32),
            trans=idx.trans_concat[p_lo:p_hi].astype(np.int8),
            red=red_concat[p_lo:p_hi].astype(np.int8),
            base=f_lo,
        ))
    return _stack_shard_dicts(per, idx.kmer_meta.words)


def _stack_shard_dicts(per, words):
    D = len(per)
    pmax = max(max(len(p["pos"]) for p in per), 1)
    fmax = max(max(len(p["offsets"]) for p in per), 1)
    smax = max(max(len(p["trans"]) for p in per), 1)
    out = dict(
        keys=np.full((D, pmax, words), 0xFFFFFFFF, dtype=np.uint32),
        pos=np.zeros((D, pmax), dtype=np.int32),
        frame=np.zeros((D, pmax), dtype=np.int32),      # LOCAL frame ids
        offsets=np.zeros((D, fmax), dtype=np.int32),
        lengths=np.zeros((D, fmax), dtype=np.int32),
        trans=np.zeros((D, smax), dtype=np.int8),
        red=np.zeros((D, smax), dtype=np.int8),
        base=np.zeros((D,), dtype=np.int32),
    )
    for i, p in enumerate(per):
        n = len(p["pos"])
        out["keys"][i, :n] = p["keys"]
        out["pos"][i, :n] = p["pos"]
        out["frame"][i, :n] = p["frame"]
        out["offsets"][i, :len(p["offsets"])] = p["offsets"]
        out["lengths"][i, :len(p["lengths"])] = p["lengths"]
        out["trans"][i, :len(p["trans"])] = p["trans"]
        out["red"][i, :len(p["red"])] = p["red"]
        out["base"][i] = p["base"]
    return out


def make_sharded_band_scorer(mesh: Mesh, N: int, D: int, gap_first: int,
                             gap_extend: int, kernel: str = "pallas"):
    """Pass-1 banded extension over the (q, db) mesh: every device
    gathers the virtual subject windows of ITS matches from ITS local
    subject shard and runs the banded SW kernel — the distributed form
    of ``extend.sw_scores_device`` (the subject concat is never
    replicated; per-device bytes scale ~1/db_shards).

    Inputs (global shapes; Qm = q-shards, Dm = db-shards):
      trans_q    (G, L) int8/int32     -> P('q', None)   query frame rows
      trans_sbj  (Dm, S) int8          -> P('db', None)  local subject concat
      offsets    (Dm, F) int32         -> P('db', None)  local frame offsets
      lengths    (Dm, F) int32         -> P('db', None)
      match arrays (Qm, Dm, Bp) int32  -> P('q', 'db', None), LOCAL ids:
        qry_id relative to the q shard's first frame row, subj_id the
        LOCAL frame id within the db shard; rows padded with qry_len=0
      e8         (A+1, A+1) int8       -> replicated
    Output: scores (Qm, Dm, Bp) int32 -> P('q', 'db', None).

    ``kernel``: 'pallas' (TPU) or 'xla' (portable; used by the CPU-mesh
    dry run so the REAL production step is what multichip validates).
    """
    from ..ops import sw_band

    def local(trans_q, trans_sbj, offsets, lengths, qry_id, qry_start,
              qry_len, subj_id, d_lo, d_row, e8):
        trans_sbj = trans_sbj[0]
        offsets = offsets[0]
        lengths = lengths[0]
        qry_id = qry_id[0, 0]
        qry_start = qry_start[0, 0]
        qry_len = qry_len[0, 0]
        subj_id = subj_id[0, 0]
        d_lo = d_lo[0, 0]
        d_row = d_row[0, 0]

        pad = e8.shape[0] - 1
        iq = jnp.arange(N, dtype=jnp.int32)
        qidx = qry_start[:, None] + iq[None, :]
        qwin = trans_q[jnp.clip(qry_id, 0, trans_q.shape[0] - 1)[:, None],
                       jnp.clip(qidx, 0, trans_q.shape[1] - 1)]
        qwin = jnp.where(iq[None, :] < qry_len[:, None], qwin, pad)

        sid = jnp.clip(subj_id, 0, offsets.shape[0] - 1)
        spos = d_lo[:, None] + iq[None, :]
        sval = (spos >= 0) & (spos < lengths[sid][:, None]) \
            & (iq[None, :] < (qry_len + d_row)[:, None])
        sabs = offsets[sid][:, None] + spos
        swin = trans_sbj[jnp.clip(sabs, 0, trans_sbj.shape[0] - 1)] \
            .astype(jnp.int32)
        swin = jnp.where(sval, swin, pad)

        qwin = qwin.astype(jnp.int32)
        if kernel == "pallas":
            out = sw_band.sw_band_score_device(
                qwin, swin, d_row, e8, D, gap_first, gap_extend)
        else:
            ext32 = e8.astype(jnp.int32)
            if sw_band._XDROP:
                # pure-XLA chunk-granular X-drop, same plan chunk size
                # the pallas kernel would use on these (N, D) windows —
                # byte-identical scores across backends (same policy as
                # extend._run_bucketed)
                plan_nc = sw_band._plan(N, D)[3]
                best = sw_xla.sw_xdrop_score_batch(
                    qwin, swin, ext32, gap_first, gap_extend, d_row,
                    jnp.full(qwin.shape[0], plan_nc, jnp.int32),
                    sw_band._XDROP)
            else:
                best, _, _ = sw_xla.sw_score_batch(
                    qwin, swin, ext32, gap_first, gap_extend, band_d=d_row)
            out = best.astype(jnp.int32)
        return out[None, None]

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("q", None), P("db", None), P("db", None), P("db", None),
                  P("q", "db", None), P("q", "db", None), P("q", "db", None),
                  P("q", "db", None), P("q", "db", None), P("q", "db", None),
                  P(None, None)),
        out_specs=P("q", "db", None),
    )
    return jax.jit(step)


def make_sharded_seeder(mesh: Mesh, fused):
    """Wrap a seeder's fused program (third element of
    seeding.make_seeder's result) for a 2-D ('q', 'db') mesh: query
    inputs sharded over 'q' (whole-query frame groups — pipeline buckets
    Q to multiples of 16), index/subject tensors over 'db'.  Returns a
    jitted function producing hit arrays with leading (q, db) axes.

    Id conventions (must stay in sync with pipeline._sharded_collect):
    slot_frame arrives with BATCH-GLOBAL query-frame ids and is rebased
    to shard-local ids inside `local` (the host adds q_base back);
    emitted s_frame ids are shard-LOCAL (the host adds the shard's
    frame base).  Passing pre-localized slot ids would double-rebase
    and silently lose every match on q-shards >= 1.

    Padded key rows are 0xFFFFFFFF-filled, which sorts after every real
    packed prefix (ranks are stored +1 in the top bits, always < 0xF...),
    so searching the padded row range is equivalent to the exact range."""

    def local(keys, pos, frame, offsets, lengths, trans, red,
              red_q, qlens, slot_frame, slot_begin, slot_rem, hits0,
              trans_q, subst_fwd, subst_rev, bucket):
        # slot_frame values are BATCH-GLOBAL query-frame row ids while
        # red_q/qlens/trans_q here are the shard-LOCAL blocks: rebase to
        # local ids (the host adds q_base back, pipeline._sharded_collect).
        # Without this every query on q-shard >= 1 gathers a clamped
        # padding row and silently loses all matches.
        q_base = jax.lax.axis_index("q") * red_q.shape[0]
        slot_frame = jnp.where(slot_frame >= 0,
                               slot_frame - q_base, slot_frame)
        res = fused(keys[0], red_q, qlens,
                    slot_frame, slot_begin, slot_rem, hits0,
                    pos[0], frame[0], offsets[0], lengths[0],
                    trans[0], trans_q, red[0], subst_fwd, subst_rev,
                    bucket[0])
        st = res["stats"]
        outs = (res["q_frame"], res["q_begin"], res["seed_len"],
                res["s_frame"], res["s_off"], res["valid"], res["passed"],
                st["hits_located"], st["hits_overflow"],
                st["failed_prescore"], st["cursors_overflow"])
        return tuple(x[None, None] for x in outs)

    P_ = P
    # queries data-parallel over 'q' (frames/slots sharded in whole-query
    # groups), index over 'db'; outputs carry (q, db) leading axes
    arr2 = P_("q", "db", None)
    scal = P_("q", "db")
    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P_("db", None, None), P_("db", None), P_("db", None),
                  P_("db", None), P_("db", None),
                  P_("db", None), P_("db", None),
                  P_("q", None), P_("q"),
                  P_("q", None), P_("q", None), P_("q", None), P_("q"),
                  P_("q", None), P_(None, None), P_(None, None),
                  P_("db", None)),
        out_specs=(arr2,) * 7 + (scal,) * 4,
    )
    return jax.jit(step)

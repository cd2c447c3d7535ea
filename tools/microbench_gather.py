"""Microbenchmark: does key-table gather cost scale with row WIDTH?

If the (P, words) gather is byte-bound, stage-1 initial searches
(masks cover only ceil(k/cpw) of the 4 key words) could gather a
narrower slice.  If it is row-latency-bound, width is free and the
idea is dead.  Times reps INSIDE one jitted lax.scan with the probe
indices derived from the carry (docs/PERF.md section 3 rules).

Usage: python tools/microbench_gather.py [artifact.lit] [N] [reps]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/lambda_tpu/jax"))

import numpy as np


def main() -> None:
    lit = sys.argv[1] if len(sys.argv) > 1 else "/var/tmp/db_100000000.lit"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 46080
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import jax
    import jax.numpy as jnp

    from lambda_tpu.index import artifact

    idx = artifact.load_index(lit)
    keys = np.asarray(idx.get_kmer().keys)
    P, words = keys.shape
    print(json.dumps({"probe": "config", "P": P, "words": words,
                      "N": N, "reps": reps,
                      "table_mb": round(keys.nbytes / 1e6, 1)}))

    d_keys = jax.device_put(keys)
    d_k2 = jax.device_put(np.ascontiguousarray(keys[:, :2]))
    d_k1 = jax.device_put(np.ascontiguousarray(keys[:, 0]))
    rng = np.random.default_rng(0)
    base_idx = jax.device_put(
        rng.integers(0, P - 1, size=N).astype(np.int32))

    def timeit(name, fn):
        r = fn()          # compile + warm
        np.asarray(r)
        t0 = time.perf_counter()
        r = fn()
        np.asarray(r)
        dt = time.perf_counter() - t0
        print(json.dumps({"probe": name, "total_s": round(dt, 4),
                          "per_gather_us": round(dt / reps * 1e6, 1)}))

    def make(tab, slice_words=None):
        @jax.jit
        def run(tab, idx0):
            def body(carry, i):
                # idx depends on the carry so XLA cannot hoist the body
                ix = (idx0 + carry) % (P - 1)
                g = tab[ix] if slice_words is None else tab[ix, :slice_words]
                s = jnp.sum(g.astype(jnp.int32))
                return carry + (s & 1), s
            _, ss = jax.lax.scan(body, jnp.int32(0),
                                 jnp.arange(reps, dtype=jnp.int32))
            return ss
        return lambda: run(tab, base_idx)

    timeit("rows4_full16B", make(d_keys))
    timeit("rows4_slice2", make(d_keys, slice_words=2))
    timeit("rows2_8B", make(d_k2))
    timeit("rows1_4B", make(d_k1))


if __name__ == "__main__":
    main()

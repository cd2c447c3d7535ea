"""Benchmark: banded Smith-Waterman cell updates per second per chip.

Runs the wavefront SW scoring kernel (the framework's hot kernel,
equivalent of the reference's SeqAn2 SIMD alignment,
``/root/reference/src/search_algo.hpp:1044-1134``) on realistic protein
extension shapes and reports GCUPS (giga cell updates / s).

Baseline: BASELINE.json targets >= 70% of VPU speed-of-light.  The
speed-of-light estimate assumes ~8 VPU int ops per DP cell at the chip's
vector throughput; ``vs_baseline`` is measured_gcups / (0.7 * SOL_gcups),
i.e. 1.0 == the round target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lambda_tpu.ops import sw_xla

    dev = jax.devices()[0]
    plat = dev.platform

    # flagship extension shape: 512 alignments x 256aa query x 320aa window
    B, M, N = 512, 256, 320
    rng = np.random.default_rng(0)
    A = 27
    subst = np.full((A, A), -2, dtype=np.int32)
    np.fill_diagonal(subst, 5)
    ext = sw_xla.extend_matrix(subst)
    q = rng.integers(0, A, size=(B, M)).astype(np.int32)
    s = rng.integers(0, A, size=(B, N)).astype(np.int32)

    dq, ds_, de = jnp.asarray(q), jnp.asarray(s), jnp.asarray(ext)

    # warmup/compile
    best, _, _ = sw_xla.sw_score_batch(dq, ds_, de, -12, -1)
    best.block_until_ready()

    reps = 5 if plat == "cpu" else 20
    t0 = time.perf_counter()
    for _ in range(reps):
        best, _, _ = sw_xla.sw_score_batch(dq, ds_, de, -12, -1)
    best.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    cells = B * M * N
    gcups = cells / dt / 1e9

    # VPU speed-of-light estimate: 8x128 lanes, ~4 int lanes-issue/cycle,
    # ~0.94-1.7 GHz depending on generation; assume v5e-class 1.7e9 Hz and
    # ~8 vector ops per cell.
    if plat == "cpu":
        sol_gcups = 1.0  # meaningless on CPU; report ratio vs itself
    else:
        vpu_ops_per_s = 8 * 128 * 4 * 1.7e9
        sol_gcups = vpu_ops_per_s / 8 / 1e9

    vs_baseline = gcups / (0.7 * sol_gcups)

    print(json.dumps({
        "metric": "banded-SW GCUPS/chip",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()

#!/bin/bash
# One-shot round-3 measurement sequence for the real TPU chip.
# Runs the kernel bench at the flagship and small-batch operating
# points plus the e2e throughput bench; writes JSON lines to
# MEASURE_r03.jsonl.  Each step is watchdogged so a dying link fails
# loudly (bench.py probes the link in a subprocess before importing
# jax).
set -u
cd "$(dirname "$0")/.."
out=MEASURE_r03.jsonl
: > "$out"
echo "# $(date -u +%FT%TZ) measurement run" >> "$out"

run() {
    local label="$1"; shift
    echo "--- $label" >&2
    local line
    line=$("$@" 2>/dev/null | tail -1)
    if [ -n "$line" ]; then
        echo "{\"run\": \"$label\", \"result\": $line}" >> "$out"
    else
        echo "{\"run\": \"$label\", \"result\": null}" >> "$out"
    fi
}

export LAMBDA_BENCH_TIMEOUT=1500
run bench_flagship   timeout 1600 python bench.py
run bench_B12k       env LAMBDA_BENCH_BFACT=8 timeout 1600 python bench.py
run bench_B3k        env LAMBDA_BENCH_BFACT=2 timeout 1600 python bench.py
run bench_xdrop      env LAMBDA_SW_XDROP=20 timeout 1600 python bench.py
run e2e_256q         timeout 2400 python bench_e2e.py 256 500
run e2e_1024q        timeout 3600 python bench_e2e.py 1024 500
cat "$out"

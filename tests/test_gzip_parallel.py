"""Native parallel gzip (P6 threaded compression): valid gzip members,
round-trip identity, determinism, and the streaming multi-member
writer."""

import gzip

import numpy as np
import pytest

from lambda_tpu import native

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native lib unavailable")


@needs_native
def test_gzip_compress_roundtrip():
    rng = np.random.default_rng(0)
    for size in (0, 1, 1000, (1 << 20) + 12345, 3 << 20):
        data = rng.integers(0, 64, size=size).astype(np.uint8).tobytes()
        comp = native.gzip_compress(data, level=6, chunk=1 << 19)
        assert comp is not None
        assert gzip.decompress(comp) == data
        # deterministic for fixed chunking
        assert native.gzip_compress(data, level=6, chunk=1 << 19) == comp


@needs_native
def test_gzip_writer_multi_member(tmp_path):
    from lambda_tpu import misc

    p = tmp_path / "big.txt.gz"
    w = misc.open_output(p)
    lines = [f"line {i} " + "x" * 100 + "\n" for i in range(5000)]
    for ln in lines:
        w.write(ln)
    w.close()
    with gzip.open(p, "rt") as fh:
        assert fh.read() == "".join(lines)

"""Native prefetch loader + profiling utilities."""
import os

import numpy as np

from egoscaler_tpu.runtime.loader import (
    PrefetchLoader,
    prefetch_npy,
    _build,
)
from egoscaler_tpu.runtime.profiling import StageTimer, memory_mb


def test_native_lib_builds():
    lib = _build()
    assert lib is not None, "g++ build of the native loader failed"


def test_prefetch_loader_roundtrip(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(12):
        a = rng.normal(size=(32, 6)).astype(np.float32)
        p = str(tmp_path / f"x{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    out = prefetch_npy(paths, threads=3)
    for a, b in zip(arrays, out):
        np.testing.assert_array_equal(a, b)


def test_prefetch_loader_raw_bytes(tmp_path):
    p = str(tmp_path / "blob.bin")
    payload = os.urandom(10000)
    with open(p, "wb") as f:
        f.write(payload)
    loader = PrefetchLoader([p, p, p], threads=2, depth=2)
    got = sorted(i for i, _ in loader)
    assert got == [0, 1, 2]
    loader.close()


def test_stage_timer():
    t = StageTimer()
    with t.track("depth", items=4):
        pass
    with t.track("depth", items=4):
        pass
    s = t.summary()
    assert s["depth"]["count"] == 8
    assert memory_mb() > 10

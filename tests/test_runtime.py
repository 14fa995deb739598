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


def test_leafwise_materializer_fills_int8_leaves():
    """Quantized trees (models/quantize.py) materialize with RANDOM int8
    weights so timing runs stream incompressible data, while non-float
    non-int8 leaves stay zero."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.pointllm import TrajPointLLM
    from egoscaler_tpu.runtime.params import leafwise_bf16_params

    cfg = PointLLMConfig().tiny()
    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8")
    )
    model = TrajPointLLM(qcfg, remat=False)
    ids = jnp.full((1, 8), 5, jnp.int32)
    pc = jnp.zeros((1, cfg.point_bert.npoints, 6), jnp.float32)
    params = leafwise_bf16_params(model, ids, pc)
    flat = jax.tree_util.tree_leaves_with_path(params)
    int8_leaves = [l for _, l in flat if l.dtype == jnp.int8]
    assert int8_leaves, "quant model should carry int8 leaves"
    for leaf in int8_leaves:
        assert int(jnp.sum(jnp.abs(leaf.astype(jnp.int32)))) > 0
        assert int(jnp.max(leaf)) <= 127 and int(jnp.min(leaf)) >= -127

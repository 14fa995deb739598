"""Mesh-sharded LLM judge (the 70B-annotation-stage path) on the virtual
8-device CPU mesh: params TP-sharded, batch data-sharded, generation runs
under the mesh — the fairscale-model-parallel replacement (SURVEY §2.4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from egoscaler_tpu.configs import MeshConfig, PointLLMConfig
from egoscaler_tpu.models.pointllm import GenerateConfig, TrajPointLLM, generate
from egoscaler_tpu.parallel.mesh import make_mesh
from egoscaler_tpu.parallel.sharding import param_specs


def test_sharded_generation_matches_single_device(rng):
    assert len(jax.devices()) >= 8
    cfg = PointLLMConfig().tiny()
    model = TrajPointLLM(cfg, remat=False)

    ids = rng.integers(10, 1000, size=(4, 24)).astype(np.int32)
    mask = np.ones_like(ids, dtype=bool)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), None)

    gen_cfg = GenerateConfig(max_new_tokens=4, do_sample=False, eos_token_id=-1)
    ref_toks, _ = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask), None,
        jax.random.PRNGKey(1), gen_cfg, cache_dtype=jnp.float32,
    )

    mesh = make_mesh(MeshConfig(data=4, model=2))
    specs = param_specs(params)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    sharded_params = jax.device_put(params, shardings)
    data_sh = NamedSharding(mesh, P("data"))
    with mesh:
        toks, _ = generate(
            model, sharded_params,
            jax.device_put(jnp.asarray(ids), data_sh),
            jax.device_put(jnp.asarray(mask), data_sh),
            None, jax.random.PRNGKey(1), gen_cfg, cache_dtype=jnp.float32,
        )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_stage_idempotency_and_crash_recovery(tmp_path, rng):
    """Failure model check (SURVEY §5.3): killing a stage mid-run and
    rerunning produces the same outputs with no duplicates."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_data_stages import make_corpus
    from egoscaler_tpu.pipelines.stages import stage1_candidates, stage2_filter

    root = str(tmp_path / "c")
    save = str(tmp_path / "o")
    os.makedirs(save, exist_ok=True)
    make_corpus(root, save, rng)
    c1 = stage1_candidates.run("egoexo4d", root, save)
    # simulate a crash after stage1 by deleting ONE fil_cands output of a
    # partial stage2 run
    stage2_filter.run(save)
    from glob import glob

    outs = glob(os.path.join(save, "fil_cands", "*", "*", "*.json"))
    assert outs
    os.remove(outs[0])
    # rerun: recreates exactly the removed file, touches nothing else
    before = {
        f: os.path.getmtime(f)
        for f in glob(os.path.join(save, "fil_cands", "*", "*", "*.json"))
    }
    stage2_filter.run(save)
    after = set(glob(os.path.join(save, "fil_cands", "*", "*", "*.json")))
    assert outs[0] in after
    for f, mt in before.items():
        assert os.path.getmtime(f) == mt  # untouched

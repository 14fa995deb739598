"""int8 weight-only decode serving: kernel numerics, param transform,
and end-to-end quantized generation quality on a trained tiny model.

The reference has no quantized inference (HF fp16 generate,
model_arch.py:77-108); this is the TPU-native serving extension —
decode streams every weight per step, so int8 halves the bandwidth
bound (ops/quant_matmul.py docstring)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
from egoscaler_tpu.models.llama import QuantDense
from egoscaler_tpu.models.pointllm import (
    GenerateConfig,
    TrajPointLLM,
    generate,
)
from egoscaler_tpu.models.quantize import (
    quantize_decode_params,
    quantized_param_bytes,
)
from egoscaler_tpu.ops.quant_matmul import (
    dequantize_weight,
    quant_matmul,
    quant_matmul_xla,
    quantize_weight,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(96, 130).astype(np.float32) * 0.05)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (130,)
    err = jnp.abs(dequantize_weight(q, s) - w)
    # symmetric absmax/127: per-channel error <= scale/2
    assert float(jnp.max(err - 0.5 * s[None, :])) <= 1e-6


def test_kernel_matches_xla_oracle():
    rng = np.random.RandomState(1)
    for m, k, n in [(8, 256, 384), (3, 130, 200), (1, 64, 512)]:
        w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.randn(m, k).astype(np.float32)).astype(
            jnp.bfloat16
        )
        q, s = quantize_weight(w)
        ref = quant_matmul_xla(x, q, s)
        out = quant_matmul(x, q, s, block_n=128, block_k=64)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32)
        )


def test_quant_dense_close_to_dense():
    from flax import linen as nn

    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(64, 48).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(5, 64).astype(np.float32))
    dense = nn.Dense(48, use_bias=False)
    ref = dense.apply({"params": {"kernel": w}}, x)
    q, s = quantize_weight(w)
    out = QuantDense(48).apply(
        {"params": {"kernel_q": q, "scale": s}}, x
    )
    # error budget: int8 rounding (~scale/2 per weight) accumulated over K
    rel = float(
        jnp.max(jnp.abs(out - ref)) / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6)
    )
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def trained_tiny():
    """A briefly-trained tiny model (same recipe as tests/test_model.py)."""
    from egoscaler_tpu.training.dataset import (
        BatchLayout,
        TrajectoryDataset,
        synthetic_structured_samples,
    )
    from egoscaler_tpu.training.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg = PointLLMConfig().tiny()
    lay = BatchLayout(cfg)
    model = TrajPointLLM(cfg, remat=False)
    ds = TrajectoryDataset(
        cfg, samples=synthetic_structured_samples(cfg, 16, seed=0), seed=0
    )
    batch = next(ds.batches(4, shuffle=False))
    batch = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k in ("input_ids", "attention_mask", "point_clouds")
    }
    tc = TrainConfig(
        batch_size=4, lr=1e-3,
        unfreeze_pc_encoder=True, unfreeze_language_model=True,
    )
    state, tx = create_train_state(model, tc, jax.random.PRNGKey(0), batch, 60)
    step = make_train_step(model, tx, lay.prompt_len, 1)
    for _ in range(12):
        state, _ = step(state, batch)
    return cfg, lay, state.full_params(), batch


def test_quantized_generate_matches_bf16(trained_tiny):
    cfg, lay, params, batch = trained_tiny
    prompt = batch["input_ids"][:, : lay.prompt_len]
    pmask = batch["attention_mask"][:, : lay.prompt_len].astype(bool)
    pcs = batch["point_clouds"]
    gen = GenerateConfig(max_new_tokens=16, do_sample=False)

    base = TrajPointLLM(cfg, remat=False)
    tok_ref, len_ref = generate(
        base, params, prompt, pmask, pcs, jax.random.PRNGKey(1), gen
    )

    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8")
    )
    qmodel = TrajPointLLM(qcfg, remat=False)
    qparams = quantize_decode_params(params)
    tok_q, len_q = generate(
        qmodel, qparams, prompt, pmask, pcs, jax.random.PRNGKey(1), gen
    )

    # int8 rounding can flip near-ties; on a trained model the greedy
    # streams must agree almost everywhere
    agree = float(jnp.mean((tok_ref == tok_q).astype(jnp.float32)))
    assert agree >= 0.9, agree

    # param tree really shrank: projections+head are ~all the params
    ratio = quantized_param_bytes(qparams) / quantized_param_bytes(
        jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params
        )
    )
    # tiny config: lm_head (the dominant quantized leaf) halves, the
    # equally-large embed_tokens stays bf16 -> ~0.75 expected; flagship
    # (trunk-dominated) reaches ~0.55
    assert ratio < 0.8, ratio


def test_quantized_speculative_token_exact(trained_tiny):
    """int8 target composes with speculative decoding: spec output is
    token-exact vs the int8 target's own greedy generate (the invariant
    speculation guarantees regardless of weight precision)."""
    from egoscaler_tpu.serving.speculative import speculative_generate

    cfg, lay, params, batch = trained_tiny
    prompt = batch["input_ids"][:, : lay.prompt_len]
    pmask = batch["attention_mask"][:, : lay.prompt_len].astype(bool)
    pcs = batch["point_clouds"]
    gen = GenerateConfig(max_new_tokens=12, do_sample=False)

    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8")
    )
    qmodel = TrajPointLLM(qcfg, remat=False)
    qparams = quantize_decode_params(params)

    tok_plain, _ = generate(
        qmodel, qparams, prompt, pmask, pcs, jax.random.PRNGKey(1), gen
    )
    # draft = the bf16 model (weights differ numerically -> imperfect
    # acceptance, exercising the reject path too)
    dmodel = TrajPointLLM(cfg, remat=False)
    tok_spec, _, stats = speculative_generate(
        qmodel, qparams, dmodel, params, prompt, pmask, pcs, gen, k=3
    )
    np.testing.assert_array_equal(
        np.asarray(tok_spec), np.asarray(tok_plain)
    )
    assert int(stats["chunks"]) > 0


def test_quantized_engine_matches_offline(trained_tiny):
    """int8 model serves through the continuous-batching engine
    token-exactly vs its own offline generate."""
    from egoscaler_tpu.serving import ServingEngine

    cfg, lay, params, batch = trained_tiny
    ids = np.asarray(batch["input_ids"][:, : lay.prompt_len])
    mask = np.asarray(batch["attention_mask"][:, : lay.prompt_len]) > 0
    pcs = np.asarray(batch["point_clouds"])
    gen = GenerateConfig(max_new_tokens=10, do_sample=False)

    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8")
    )
    qmodel = TrajPointLLM(qcfg, remat=False)
    qparams = quantize_decode_params(params)

    toks, lens = generate(
        qmodel, qparams, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(pcs), jax.random.PRNGKey(1), gen,
    )
    eng = ServingEngine(
        qmodel, qparams, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=4,
    )
    req_ids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(len(ids))]
    results = eng.run()
    for i, rid in enumerate(req_ids):
        n = int(lens[i])
        want = np.asarray(toks[i])[: min(n + 1, gen.max_new_tokens)]
        np.testing.assert_array_equal(results[rid], want)


def test_quantized_generation_under_mesh_matches_single_device(trained_tiny):
    """int8 params shard under the TP rules (parallel/sharding.py
    kernel_q/scale rows) and mesh generation matches single-device.
    On hardware the pallas custom call itself runs GSPMD-replicated
    (weights gathered) — TP int8 is a correctness path; the bandwidth
    win is the single-chip serving mode."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from egoscaler_tpu.configs import MeshConfig
    from egoscaler_tpu.parallel.mesh import make_mesh
    from egoscaler_tpu.parallel.sharding import param_specs

    cfg, lay, params, batch = trained_tiny
    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8")
    )
    qmodel = TrajPointLLM(qcfg, remat=False)
    qparams = quantize_decode_params(params)
    prompt = batch["input_ids"][:, : lay.prompt_len]
    pmask = batch["attention_mask"][:, : lay.prompt_len].astype(bool)
    pcs = batch["point_clouds"]
    gen = GenerateConfig(max_new_tokens=8, do_sample=False, eos_token_id=-1)

    ref, _ = generate(
        qmodel, qparams, prompt, pmask, pcs, jax.random.PRNGKey(1), gen,
        cache_dtype=jnp.float32,
    )

    specs = param_specs(qparams)
    # the rules must actually shard the quant leaves over `model`
    from flax import traverse_util

    flat_specs = traverse_util.flatten_dict(specs, sep="/")
    assert any(
        "kernel_q" in k and s == P(None, "model")
        for k, s in flat_specs.items()
    )
    assert any(
        k.endswith("q_proj/scale") and s == P("model")
        for k, s in flat_specs.items()
    )

    mesh = make_mesh(MeshConfig(data=4, model=2))
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    sharded = jax.device_put(qparams, shardings)
    data_sh = NamedSharding(mesh, P("data"))
    with mesh:
        toks, _ = generate(
            qmodel, sharded,
            jax.device_put(prompt, data_sh),
            jax.device_put(pmask, data_sh),
            jax.device_put(pcs, data_sh),
            jax.random.PRNGKey(1), gen, cache_dtype=jnp.float32,
        )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_quantized_init_structure_matches_transform(trained_tiny):
    """model.init under weight_quant produces the same tree structure the
    transform emits — converted params load without surgery."""
    cfg, lay, params, batch = trained_tiny
    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8")
    )
    qmodel = TrajPointLLM(qcfg, remat=False)
    init = jax.eval_shape(
        lambda: qmodel.init(
            jax.random.PRNGKey(0),
            batch["input_ids"][:1],
            batch["point_clouds"][:1],
        )
    )
    qparams = quantize_decode_params(params)
    from flax import traverse_util

    flat_init = traverse_util.flatten_dict(init)
    flat_q = traverse_util.flatten_dict(qparams)
    assert set(flat_init.keys()) == set(flat_q.keys())
    for k in flat_init:
        assert flat_init[k].shape == jnp.shape(flat_q[k]), k


def test_quant_matmul_activation_gradient():
    """quant_matmul_diff backprops through the int8 layer: dx matches the
    dequantized-Dense gradient (frozen-trunk training,
    run_7b_chip.py --quant_trunk)."""
    from egoscaler_tpu.ops.quant_matmul import (
        dequantize_weight, quant_matmul_diff, quantize_weight,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    q, s = quantize_weight(w)
    w_deq = dequantize_weight(q, s)

    def f_quant(x):
        return jnp.sum(jnp.sin(quant_matmul_diff(x, q, s)))

    def f_ref(x):
        return jnp.sum(jnp.sin(x @ w_deq))

    gx = jax.grad(f_quant)(x)
    gr = jax.grad(f_ref)(x)
    # the custom bwd contracts in bf16 (one transient dequant, no
    # persistent copy) — compare at bf16 precision
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                               atol=5e-2, rtol=2e-2)


def test_quant_trunk_train_step_learns():
    """int8_trunk: frozen LLaMA layers stored int8 (QuantDense), lm_head
    stays a trainable bf16 Dense; a frozen-recipe train step runs and
    the loss falls — gradients flow THROUGH the quantized trunk."""
    from flax import traverse_util

    from egoscaler_tpu.models.quantize import quantize_decode_params
    from egoscaler_tpu.training.dataset import BatchLayout
    from egoscaler_tpu.training.trainer import (
        TrainState, frozen_patterns, make_optimizer, make_train_step,
        partition_params,
    )

    cfg = PointLLMConfig().tiny()
    model = TrajPointLLM(cfg, remat=False)
    rng = np.random.RandomState(0)
    lay = BatchLayout(cfg)
    b = 2
    ids = np.full((b, lay.total_len), 5, np.int32)
    ids[:, 0] = cfg.point_start_token_id
    ids[:, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    ids[:, 1 + cfg.point_bert.point_token_len:] = rng.randint(
        5, 100, size=(b, lay.total_len - 1 - cfg.point_bert.point_token_len)
    )
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, lay.total_len), bool),
        "point_clouds": jnp.asarray(
            rng.randn(b, cfg.point_bert.npoints, 6).astype(np.float32)
        ),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["point_clouds"]
    )
    qparams = quantize_decode_params(params, trunk_only=True)
    # lm_head kernel still a plain Dense kernel
    flat = traverse_util.flatten_dict(qparams, sep="/")
    assert "params/lm_head/kernel" in flat
    assert any("kernel_q" in k for k in flat)

    qcfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, weight_quant="int8_trunk")
    )
    qmodel = TrajPointLLM(qcfg, remat=False)
    tcfg = TrainConfig(batch_size=b, lr=1e-3)
    trainable, frozen = partition_params(qparams, frozen_patterns(tcfg))
    assert any("kernel_q" in k for k in frozen)
    assert not any("kernel_q" in k for k in trainable)
    tx = make_optimizer(tcfg, total_steps=10)
    state = TrainState(
        trainable, frozen, tx.init(trainable), jnp.asarray(0, jnp.int32)
    )
    step = make_train_step(qmodel, tx, lay.prompt_len, 1, donate=False)
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

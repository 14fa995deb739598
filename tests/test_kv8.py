"""int8 KV-cache decode (KV8): kernel vs oracle + end-to-end gates.

The Pallas flash-decode kernel (ops/kv8_attention.py) must match the
XLA dequantize-then-attend oracle bit-for-bit in f32 statistics, and a
tiny model generating with cfg.llama.kv_quant='int8' must agree with
the bf16-cache greedy decode (the serving quality gate; measured at
flagship scale by scripts/bench_quant_decode.py --kv8)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egoscaler_tpu.ops.kv8_attention import (
    decode_attention_kv8,
    decode_attention_kv8_xla,
    dequantize_kv,
    quantize_kv,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(3, 17, 4, 32)) * 2.0)
    q8, s = quantize_kv(t)
    assert q8.dtype == jnp.int8 and s.shape == (3, 17, 4)
    back = dequantize_kv(q8, s, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(t))
    bound = np.asarray(s)[..., None] * 0.5 + 1e-6  # half a quantization step
    assert (err <= bound).all()


@pytest.mark.parametrize("kvh,h", [(4, 4), (2, 4)])  # MHA and GQA g=2
def test_kernel_matches_xla_oracle(kvh, h):
    rng = np.random.default_rng(1)
    b, t, d = 3, 40, 32
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k = rng.normal(size=(b, t, kvh, d)).astype(np.float32)
    v = rng.normal(size=(b, t, kvh, d)).astype(np.float32)
    k8, ks = quantize_kv(jnp.asarray(k))
    v8, vs = quantize_kv(jnp.asarray(v))
    # ragged per-row validity + a hole in the middle (mid-prompt pad)
    mask = np.zeros((b, t), bool)
    mask[0, :7] = True
    mask[1, :t] = True
    mask[2, :25] = True
    mask[2, 10:14] = False
    mask = jnp.asarray(mask)
    got = decode_attention_kv8(q, k8, ks, v8, vs, mask, block_t=16)
    want = decode_attention_kv8_xla(q, k8, ks, v8, vs, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )
    # and both near the unquantized attention
    from egoscaler_tpu.ops.attention import xla_attention

    g = h // kvh
    k_e = np.repeat(k, g, axis=2) if g > 1 else k
    v_e = np.repeat(v, g, axis=2) if g > 1 else v
    exact = xla_attention(
        q[:, None], jnp.asarray(k_e), jnp.asarray(v_e),
        mask=mask[:, None, None, :],
    )[:, 0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), atol=6e-2, rtol=6e-2
    )


def test_kernel_block_boundaries_and_padding():
    """T not a multiple of block_t; masked tail must not leak."""
    rng = np.random.default_rng(2)
    b, t, h, d = 2, 37, 2, 16
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k8, ks = quantize_kv(jnp.asarray(rng.normal(size=(b, t, h, d))))
    v8, vs = quantize_kv(jnp.asarray(rng.normal(size=(b, t, h, d))))
    mask = jnp.asarray(np.tri(1, t, 20, dtype=bool).repeat(b, 0))  # 21 valid
    got = decode_attention_kv8(q, k8, ks, v8, vs, mask, block_t=16)
    want = decode_attention_kv8_xla(q, k8, ks, v8, vs, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
    # growing the cache with masked-out garbage must not change anything
    pad = 27
    k8b = jnp.concatenate([k8, jnp.full((b, pad, h, d), 13, jnp.int8)], 1)
    v8b = jnp.concatenate([v8, jnp.full((b, pad, h, d), -9, jnp.int8)], 1)
    ksb = jnp.concatenate([ks, jnp.ones((b, pad, h))], 1)
    vsb = jnp.concatenate([vs, jnp.ones((b, pad, h))], 1)
    mb = jnp.concatenate([mask, jnp.zeros((b, pad), bool)], 1)
    got2 = decode_attention_kv8(q, k8b, ksb, v8b, vsb, mb, block_t=16)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=1e-6)


def _tiny_kv8_setup(kv_quant):
    from egoscaler_tpu.configs import PointLLMConfig
    from egoscaler_tpu.models.pointllm import (
        GenerateConfig, TrajPointLLM, generate,
    )

    cfg = PointLLMConfig().tiny()
    cfg = dataclasses.replace(
        cfg, llama=dataclasses.replace(cfg.llama, kv_quant=kv_quant)
    )
    model = TrajPointLLM(cfg, remat=False)
    rng = np.random.RandomState(3)
    b, p = 2, 24
    npts = cfg.point_bert.npoints
    ids = np.full((b, p), 5, np.int32)
    ids[:, 0] = cfg.point_start_token_id
    ids[:, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    text0 = 1 + cfg.point_bert.point_token_len
    ids[:, text0:] = rng.randint(5, 100, size=(b, p - text0))
    mask = np.ones((b, p), bool)
    mask[1, -4:] = False
    pcs = rng.randn(b, npts, 6).astype(np.float32)
    return cfg, model, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pcs)


def test_generate_kv8_greedy_agreement():
    """Greedy generate with the int8 cache must agree with the bf16
    cache on a tiny random model (the serving quality gate's test-scale
    analogue; f32 cache dtype isolates the int8 effect)."""
    from egoscaler_tpu.models.pointllm import GenerateConfig, generate

    cfg_b, model_b, ids, mask, pcs = _tiny_kv8_setup(None)
    cfg_q, model_q, *_ = _tiny_kv8_setup("int8")
    params = model_b.init(jax.random.PRNGKey(0), ids, pcs)
    gen = GenerateConfig(max_new_tokens=10, do_sample=False)
    tok_b, len_b = generate(
        model_b, params, ids, mask, pcs, jax.random.PRNGKey(1), gen,
        cache_dtype=jnp.float32,
    )
    tok_q, len_q = generate(
        model_q, params, ids, mask, pcs, jax.random.PRNGKey(1), gen,
        cache_dtype=jnp.float32,
    )
    agree = float(np.mean(np.asarray(tok_b) == np.asarray(tok_q)))
    assert agree >= 0.9, f"greedy agreement {agree}"


def test_engine_kv8_matches_offline_generate():
    """The serving engine over an int8 cache is token-exact vs the
    KV8 offline generate (same numerics both sides)."""
    from egoscaler_tpu.models.pointllm import GenerateConfig, generate
    from egoscaler_tpu.serving import ServingEngine

    cfg, model, ids, mask, pcs = _tiny_kv8_setup("int8")
    params = model.init(jax.random.PRNGKey(0), ids, pcs)
    gen = GenerateConfig(max_new_tokens=8, do_sample=False)
    otoks, olens = generate(
        model, params, ids, mask, pcs, jax.random.PRNGKey(1), gen
    )
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=ids.shape[1], gen=gen, chunk=3
    )
    rids = [eng.submit(np.asarray(ids[i]), np.asarray(mask[i]),
                       np.asarray(pcs[i])) for i in range(2)]
    results = eng.run()
    for i, rid in enumerate(rids):
        n = int(olens[i])
        want = np.asarray(otoks[i])[: min(n + 1, gen.max_new_tokens)]
        np.testing.assert_array_equal(results[rid], want)


def test_fold_impl_matches_heads_impl():
    """The MXU-folded MHA kernel (impl='fold') computes the same
    attention as the per-head-loop kernel (impl='heads') — both f32
    accumulation over the same block schedule."""
    import jax.numpy as jnp

    from egoscaler_tpu.ops.kv8_attention import (
        decode_attention_kv8, quantize_kv,
    )

    rng = np.random.default_rng(7)
    b, t, h, d = 2, 300, 4, 32  # non-multiple T exercises padding
    k = rng.normal(size=(b, t, h, d)).astype(np.float32)
    v = rng.normal(size=(b, t, h, d)).astype(np.float32)
    q = rng.normal(size=(b, h, d)).astype(np.float32)
    k8, ks = quantize_kv(jnp.asarray(k))
    v8, vs = quantize_kv(jnp.asarray(v))
    mask = np.ones((b, t), bool)
    mask[1, 150:] = False
    out_heads = decode_attention_kv8(
        jnp.asarray(q), k8, ks, v8, vs, jnp.asarray(mask),
        block_t=128, impl="heads",
    )
    out_fold = decode_attention_kv8(
        jnp.asarray(q), k8, ks, v8, vs, jnp.asarray(mask),
        block_t=128, impl="fold",
    )
    np.testing.assert_allclose(
        np.asarray(out_heads), np.asarray(out_fold), atol=2e-5, rtol=2e-5
    )

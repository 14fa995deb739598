"""Speculative decoding vs the offline greedy generate oracle.

Greedy speculative decoding must emit EXACTLY the target model's
greedy tokens no matter how good or bad the draft is — acceptance only
changes speed.  We test both extremes: a random draft (near-zero
acceptance, exercises per-row uneven advance + stale-slot overwrite)
and draft == target (full acceptance, exercises the chunk bookkeeping
at a == k).  The oracle is our own generate, itself HF-parity tested
(tests/test_convert.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egoscaler_tpu.configs import PointLLMConfig
from egoscaler_tpu.models.pointllm import (
    GenerateConfig,
    TrajPointLLM,
    generate,
)
from egoscaler_tpu.serving.speculative import speculative_generate


@pytest.fixture(scope="module")
def setup():
    cfg = PointLLMConfig().tiny()
    from egoscaler_tpu.training.dataset import BatchLayout

    lay = BatchLayout(cfg)
    model = TrajPointLLM(cfg)
    rng = np.random.RandomState(0)
    b, P = 3, lay.prompt_len
    ids = np.full((b, P), 5, np.int32)
    ids[:, 0] = cfg.point_start_token_id
    ids[:, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    text0 = 1 + cfg.point_bert.point_token_len
    ids[:, text0:] = rng.randint(5, 100, size=(b, P - text0))
    mask = np.ones((b, P), bool)
    mask[1, -2:] = False  # one padded prompt
    pcs = rng.randn(b, cfg.point_bert.npoints, 6).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids[:1]), jnp.asarray(pcs[:1])
    )
    draft_params = model.init(  # same arch, independent weights
        jax.random.PRNGKey(7), jnp.asarray(ids[:1]), jnp.asarray(pcs[:1])
    )
    gen = GenerateConfig(max_new_tokens=12, do_sample=False)
    # f32 caches: the oracle decodes 1 token/step while spec verifies
    # (k+1)-token chunks; f32 keeps the argmax comparison numerically
    # stable across the two schedules
    oracle_toks, oracle_lens = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pcs),
        jax.random.PRNGKey(1), gen, cache_dtype=jnp.float32,
    )
    return (cfg, model, params, draft_params, ids, mask, pcs, gen,
            np.asarray(oracle_toks), np.asarray(oracle_lens))


def _run_spec(model, params, dparams, ids, mask, pcs, gen, k):
    toks, lens, stats = speculative_generate(
        model, params, model, dparams,
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pcs),
        gen, k=k, cache_dtype=jnp.float32,
    )
    return np.asarray(toks), np.asarray(lens), jax.device_get(stats)


def test_random_draft_token_exact(setup):
    (cfg, model, params, dparams, ids, mask, pcs, gen,
     otoks, olens) = setup
    toks, lens, stats = _run_spec(
        model, params, dparams, ids, mask, pcs, gen, k=3
    )
    np.testing.assert_array_equal(toks, otoks)
    np.testing.assert_array_equal(lens, olens)
    # a random draft accepts (almost) nothing -> ~1 token per chunk
    assert int(stats["chunks"]) >= gen.max_new_tokens // 2


def test_self_draft_full_acceptance(setup):
    (cfg, model, params, dparams, ids, mask, pcs, gen,
     otoks, olens) = setup
    k = 3
    toks, lens, stats = _run_spec(
        model, params, params, ids, mask, pcs, gen, k=k
    )
    np.testing.assert_array_equal(toks, otoks)
    np.testing.assert_array_equal(lens, olens)
    # draft == target: every draft accepted, so each chunk emits k+1
    import math

    assert int(stats["chunks"]) <= math.ceil(gen.max_new_tokens / (k + 1)) + 1
    assert int(stats["drafts_accepted"]) >= k * (int(stats["chunks"]) - 1)


def test_eos_early_stop(setup):
    (cfg, model, params, dparams, ids, mask, pcs, gen,
     otoks, olens) = setup
    # pick a token the oracle actually emits mid-stream and make it eos:
    # both paths must then stop there identically
    eos = int(otoks[0, 4])
    gen2 = GenerateConfig(
        max_new_tokens=12, do_sample=False, eos_token_id=eos
    )
    oracle_toks, oracle_lens = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pcs),
        jax.random.PRNGKey(1), gen2, cache_dtype=jnp.float32,
    )
    toks, lens, _ = _run_spec(
        model, params, dparams, ids, mask, pcs, gen2, k=3
    )
    np.testing.assert_array_equal(toks, np.asarray(oracle_toks))
    np.testing.assert_array_equal(lens, np.asarray(oracle_lens))
    toks2, lens2, _ = _run_spec(
        model, params, params, ids, mask, pcs, gen2, k=4
    )
    np.testing.assert_array_equal(toks2, np.asarray(oracle_toks))
    np.testing.assert_array_equal(lens2, np.asarray(oracle_lens))


def test_decode_chunk_matches_stepwise(setup):
    """decode_chunk at per-row positions == sequential decode_steps."""
    (cfg, model, params, dparams, ids, mask, pcs, gen,
     otoks, olens) = setup
    from egoscaler_tpu.models.llama import init_kv_cache

    b, P = ids.shape
    t_max = P + 8
    full_mask = jnp.concatenate(
        [jnp.asarray(mask), jnp.ones((b, t_max - P), bool)], axis=1
    )
    cache = init_kv_cache(cfg.llama, b, t_max, jnp.float32)
    _, cache = model.apply(
        params, jnp.asarray(ids), jnp.asarray(pcs), full_mask, cache,
        method=TrajPointLLM.prefill,
    )
    chunk = jnp.asarray(otoks[:, :4].astype(np.int32))
    pos0 = jnp.full((b,), P, jnp.int32)

    chunk_logits, chunk_cache = model.apply(
        params, chunk, pos0, full_mask, cache,
        method=TrajPointLLM.decode_chunk,
    )
    step_cache = cache
    step_logits = []
    for j in range(4):
        lg, step_cache = model.apply(
            params, chunk[:, j], pos0 + j, full_mask, step_cache,
            method=TrajPointLLM.decode_step,
        )
        step_logits.append(lg)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(chunk_logits), np.asarray(step_logits),
        rtol=2e-5, atol=2e-5,
    )
    for lead in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(chunk_cache[lead]), np.asarray(step_cache[lead]),
            rtol=1e-4, atol=1e-5,
        )

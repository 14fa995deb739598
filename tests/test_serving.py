"""Continuous-batching serving engine vs the offline generate oracle.

The engine must produce, for every request, exactly the tokens the
batch `generate` path produces for the same prompt — while requests
are admitted into slots mid-stream, slots are reused, and every slot
decodes at its own cache position (vector cache_index path in
models/llama.py).  Reference has no concurrent serving path
(chat_gradio.py is single-request); the oracle is our own generate,
itself HF-parity tested (tests/test_convert.py).
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
from egoscaler_tpu.serving import ServingEngine
from egoscaler_tpu.training.dataset import BatchLayout


@pytest.fixture(scope="module")
def setup():
    cfg = PointLLMConfig().tiny()
    lay = BatchLayout(cfg)
    model = TrajPointLLM(cfg)
    rng = np.random.RandomState(0)
    n_req = 5
    P = lay.prompt_len
    ids = np.full((n_req, P), 5, np.int32)
    ids[:, 0] = cfg.point_start_token_id
    ids[:, 1:1 + cfg.point_bert.point_token_len] = cfg.point_patch_token_id
    # vary the text part so requests differ
    text0 = 1 + cfg.point_bert.point_token_len
    ids[:, text0:] = rng.randint(5, 100, size=(n_req, P - text0))
    mask = np.ones((n_req, P), bool)
    mask[2, -3:] = False  # one request with a shorter (padded) prompt
    pcs = rng.randn(n_req, cfg.point_bert.npoints, 6).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids[:1]), jnp.asarray(pcs[:1])
    )
    gen = GenerateConfig(max_new_tokens=12, do_sample=False)
    oracle_toks, oracle_lens = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(pcs), jax.random.PRNGKey(1), gen,
    )
    oracle = []
    for i in range(n_req):
        t = np.asarray(oracle_toks[i])
        n = int(oracle_lens[i])
        # engine emits the eos token itself when it stops early
        oracle.append(t[: min(n + 1, gen.max_new_tokens)])
    return cfg, lay, model, params, ids, mask, pcs, gen, oracle


def _check(results, oracle, req_ids):
    for i, rid in enumerate(req_ids):
        got = results[rid]
        want = oracle[i]
        np.testing.assert_array_equal(
            got, want, err_msg=f"request {i} (id {rid}) diverged"
        )


def test_more_requests_than_slots_match_offline_generate(setup):
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=4,
    )
    req_ids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(len(ids))]
    results = eng.run()
    assert len(results) == len(ids)
    _check(results, oracle, req_ids)


def test_mid_stream_admission(setup):
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=3,
    )
    first = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(2)]
    eng.step()  # both slots busy, a few tokens in
    late = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(2, 5)]
    results = eng.run()
    assert len(results) == 5
    _check(results, oracle, first + late)


def test_single_slot_sequential(setup):
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=1, prompt_len=lay.prompt_len,
        gen=gen, chunk=5,
    )
    req_ids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(3)]
    results = eng.run()
    _check(results, oracle[:3], req_ids)


def test_per_request_budgets_free_slots_early(setup):
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=2,
    )
    budgets = [3, 12, 5, 12, 4]
    req_ids = [
        eng.submit(ids[i], mask[i], pcs[i], max_new_tokens=budgets[i])
        for i in range(len(ids))
    ]
    results = eng.run()
    assert len(results) == len(ids)
    for i, rid in enumerate(req_ids):
        want = oracle[i][: budgets[i]]
        np.testing.assert_array_equal(
            results[rid], want, err_msg=f"request {i} (budget {budgets[i]})"
        )


def test_budget_validation(setup):
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=1, prompt_len=lay.prompt_len, gen=gen,
    )
    with pytest.raises(ValueError):
        eng.submit(ids[0], mask[0], pcs[0],
                   max_new_tokens=gen.max_new_tokens + 1)
    with pytest.raises(ValueError):
        eng.submit(ids[0], mask[0], pcs[0], max_new_tokens=0)


def test_prompt_shape_validation(setup):
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=1, prompt_len=lay.prompt_len, gen=gen,
    )
    with pytest.raises(ValueError):
        eng.submit(ids[0][:-1], mask[0][:-1], pcs[0])


def test_auto_param_layouts_matches_oracle(setup):
    """AOT AUTO-layout mode (the 7B-on-one-chip path): params and state
    are materialized in the decode program's preferred layouts, every
    ladder program pinned to them — tokens identical to the jit path."""
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=4, auto_param_layouts=True,
    )
    rids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(len(ids))]
    results = eng.run()
    _check(results, oracle, rids)


def test_eos_early_stop_matches_oracle(setup):
    """A request that hits eos before its budget stops there (the lane
    idles its remaining planned ticks — never wrong tokens)."""
    cfg, lay, model, params, ids, mask, pcs, gen, _ = setup
    # force real early-stops: declare the 4th greedy token of request 0
    # to be the eos id
    base_toks, _ = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(pcs), jax.random.PRNGKey(1), gen,
    )
    eos = int(np.asarray(base_toks)[0, 3])
    gen2 = GenerateConfig(
        max_new_tokens=gen.max_new_tokens, do_sample=False,
        eos_token_id=eos,
    )
    toks2, lens2 = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(pcs), jax.random.PRNGKey(1), gen2,
    )
    toks2, lens2 = np.asarray(toks2), np.asarray(lens2)
    assert int(lens2[0]) < gen.max_new_tokens  # the stop really happens
    oracle2 = [
        toks2[i][: min(int(lens2[i]) + 1, gen2.max_new_tokens)]
        for i in range(len(ids))
    ]
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen2, chunk=4,
    )
    rids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(len(ids))]
    results = eng.run()
    _check(results, oracle2, rids)


def test_engine_worker_concurrent_callers(setup):
    """Blocking callers on many threads share the engine's decode ticks
    and each gets exactly the offline-generate tokens."""
    import threading

    from egoscaler_tpu.serving.frontend import EngineWorker

    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=3,
    )
    worker = EngineWorker(eng)
    got = [None] * len(ids)
    errs = []

    def call(i):
        try:
            got[i] = worker.submit_and_wait(
                ids[i], mask[i], pcs[i], timeout=300.0
            )
        except Exception as e:  # surfaced below
            errs.append((i, e))

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(ids))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    worker.stop()
    assert not errs, errs
    for i in range(len(ids)):
        np.testing.assert_array_equal(
            got[i], oracle[i], err_msg=f"caller {i} diverged"
        )


def test_engine_worker_stop_rejects_new_work(setup):
    from egoscaler_tpu.serving.frontend import EngineWorker

    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=1, prompt_len=lay.prompt_len, gen=gen,
    )
    worker = EngineWorker(eng)
    worker.stop()
    with pytest.raises(RuntimeError):
        worker.submit_and_wait(ids[0], mask[0], pcs[0])


def test_speculative_engine_matches_offline_generate(setup):
    """Speculative continuous batching: per-slot draft-propose /
    target-verify rounds, variable tokens per round, harvest-driven slot
    release — token-exact vs offline greedy generate.  The draft here is
    the TARGET itself (100% acceptance: the accept path at full
    depth)."""
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=4, draft_model=model, draft_params=params,
        spec_k=3,
    )
    rids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(len(ids))]
    results = eng.run()
    assert len(results) == len(ids)
    _check(results, oracle, rids)


def test_speculative_engine_imperfect_draft(setup):
    """A DIFFERENT draft (fresh random init): near-zero acceptance
    exercises the reject/bonus path; output must still be token-exact,
    and per-request budgets + mid-stream admission still hold."""
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    dmodel = TrajPointLLM(cfg)
    dparams = dmodel.init(
        jax.random.PRNGKey(7), jnp.asarray(ids[:1]), jnp.asarray(pcs[:1])
    )
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=3, draft_model=dmodel, draft_params=dparams,
        spec_k=2,
    )
    budgets = [gen.max_new_tokens, 5, 3, gen.max_new_tokens, 7]
    rids = [eng.submit(ids[i], mask[i], pcs[i], max_new_tokens=budgets[i])
            for i in range(3)]
    eng.step()
    rids += [eng.submit(ids[i], mask[i], pcs[i], max_new_tokens=budgets[i])
             for i in range(3, 5)]
    results = eng.run()
    for i, rid in enumerate(rids):
        want = oracle[i][: budgets[i]]
        np.testing.assert_array_equal(
            results[rid], want, err_msg=f"request {i} diverged"
        )


def test_speculative_engine_eos_early_stop(setup):
    """eos inside an accepted speculative window stops the request there
    (harvest truncates; the lane is released for the queue)."""
    cfg, lay, model, params, ids, mask, pcs, gen, _ = setup
    base_toks, _ = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(pcs), jax.random.PRNGKey(1), gen,
    )
    eos = int(np.asarray(base_toks)[0, 3])
    gen2 = GenerateConfig(
        max_new_tokens=gen.max_new_tokens, do_sample=False,
        eos_token_id=eos,
    )
    toks2, lens2 = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(pcs), jax.random.PRNGKey(1), gen2,
    )
    toks2, lens2 = np.asarray(toks2), np.asarray(lens2)
    assert int(lens2[0]) < gen.max_new_tokens
    oracle2 = [
        toks2[i][: min(int(lens2[i]) + 1, gen2.max_new_tokens)]
        for i in range(len(ids))
    ]
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen2, chunk=4, draft_model=model, draft_params=params,
        spec_k=3,
    )
    rids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(len(ids))]
    results = eng.run()
    _check(results, oracle2, rids)


def test_speculative_engine_rejects_sampling():
    cfg = PointLLMConfig().tiny()
    model = TrajPointLLM(cfg)
    with pytest.raises(ValueError, match="greedy"):
        ServingEngine(
            model, None, num_slots=2, prompt_len=8,
            gen=GenerateConfig(do_sample=True),
            draft_model=model, draft_params=None,
        )


def test_speculative_engine_warmup_precompiles(setup):
    cfg, lay, model, params, ids, mask, pcs, gen, oracle = setup
    eng = ServingEngine(
        model, params, num_slots=2, prompt_len=lay.prompt_len,
        gen=gen, chunk=2, draft_model=model, draft_params=params,
        spec_k=2,
    )
    eng.warmup()
    assert set(eng._decode_ladder.keys()) == set(eng._decode_sizes)
    rids = [eng.submit(ids[i], mask[i], pcs[i]) for i in range(2)]
    results = eng.run()
    _check(results, oracle[:2], rids)

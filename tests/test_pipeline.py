"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh.

The reference has no pipeline parallelism (SURVEY.md §2.4: PP absent —
pointllm.py:239-240 is a comment only); these tests validate the
beyond-parity GPipe implementation: schedule correctness vs a serial
layer loop, LLaMA-trunk equivalence vs the dense LlamaModel, and
differentiability of the ppermute/scan schedule.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from egoscaler_tpu.parallel.pipeline import (
    llama_pipeline_forward,
    pipeline_apply,
    stack_layer_params,
)


def make_pipe_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices")
    return Mesh(np.asarray(devs[:n]), ("pipe",))


def simple_layer(lp, x):
    return jnp.tanh(x @ lp["w"] + lp["b"])


def make_simple_stack(key, n_layers, d):
    layers = []
    for i in range(n_layers):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        layers.append({
            "w": jax.random.normal(k1, (d, d)) * (1.0 / np.sqrt(d)),
            "b": jax.random.normal(k2, (d,)) * 0.1,
        })
    return layers


class TestPipelineSchedule:
    def test_matches_serial_loop(self):
        mesh = make_pipe_mesh(4)
        d, n_layers, batch = 16, 8, 8
        layers = make_simple_stack(jax.random.PRNGKey(0), n_layers, d)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, d))

        ref = x
        for lp in layers:
            ref = simple_layer(lp, ref)

        stacked = stack_layer_params(layers, 4)
        for num_mb in (1, 2, 4, 8):
            out = pipeline_apply(
                simple_layer, stacked, x, mesh=mesh, num_microbatches=num_mb
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5,
                err_msg=f"num_microbatches={num_mb}",
            )

    def test_single_stage_degenerate(self):
        mesh = make_pipe_mesh(1)
        d, n_layers, batch = 8, 3, 4
        layers = make_simple_stack(jax.random.PRNGKey(2), n_layers, d)
        x = jax.random.normal(jax.random.PRNGKey(3), (batch, d))
        ref = x
        for lp in layers:
            ref = simple_layer(lp, ref)
        out = pipeline_apply(
            simple_layer, stack_layer_params(layers, 1), x,
            mesh=mesh, num_microbatches=2,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_serial(self):
        """ppermute/scan transpose correctness: d loss/d params and
        d loss/d x equal the serial loop's grads."""
        mesh = make_pipe_mesh(4)
        d, n_layers, batch = 8, 4, 8
        layers = make_simple_stack(jax.random.PRNGKey(4), n_layers, d)
        x = jax.random.normal(jax.random.PRNGKey(5), (batch, d))
        tgt = jax.random.normal(jax.random.PRNGKey(6), (batch, d))
        stacked = stack_layer_params(layers, 4)

        def loss_pipe(stacked, x):
            y = pipeline_apply(
                simple_layer, stacked, x, mesh=mesh, num_microbatches=4
            )
            return jnp.mean((y - tgt) ** 2)

        def loss_serial(stacked, x):
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((-1,) + a.shape[2:]), stacked
            )
            y, _ = jax.lax.scan(
                lambda h, lp: (simple_layer(lp, h), None), x, flat
            )
            return jnp.mean((y - tgt) ** 2)

        gp = jax.grad(loss_pipe, argnums=(0, 1))(stacked, x)
        gs = jax.grad(loss_serial, argnums=(0, 1))(stacked, x)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestLlamaPipeline:
    def test_trunk_matches_dense(self):
        from egoscaler_tpu.configs import LlamaConfig
        from egoscaler_tpu.models.llama import LlamaModel

        mesh = make_pipe_mesh(4)
        cfg = LlamaConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=8,
            num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=64, vocab_size=128,
        )
        model = LlamaModel(cfg)
        b, s = 4, 12
        emb = jax.random.normal(jax.random.PRNGKey(7), (b, s, cfg.hidden_size))
        pos = jnp.broadcast_to(jnp.arange(s), (b, s))
        params = model.init(jax.random.PRNGKey(8), emb, pos)

        dense, _ = model.apply(params, emb, pos)
        piped = llama_pipeline_forward(
            cfg, params, emb, pos, mesh=mesh, num_microbatches=2
        )
        np.testing.assert_allclose(
            np.asarray(piped), np.asarray(dense), rtol=2e-4, atol=2e-4
        )


class TestPipelineWithDataAxis:
    def test_dp_pp_composition(self):
        """Pipeline over `pipe` with microbatches sharded over `data`:
        same numbers as the serial loop (DDP x GPipe on one mesh)."""
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("need 8 devices")
        mesh = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("pipe", "data"))
        d, n_layers, batch = 16, 8, 8
        layers = make_simple_stack(jax.random.PRNGKey(9), n_layers, d)
        x = jax.random.normal(jax.random.PRNGKey(10), (batch, d))
        ref = x
        for lp in layers:
            ref = simple_layer(lp, ref)
        out = pipeline_apply(
            simple_layer, stack_layer_params(layers, 4), x,
            mesh=mesh, num_microbatches=2, data_axis="data",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

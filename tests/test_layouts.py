"""runtime/layouts: AUTO-layout AOT compile + leafwise relayout.

Covers the single-chip 7B decode enabler (scripts/run_7b_chip.py): the
reference needs an 8-GPU node for the 7B model (train.py:119-125); on
TPU the same model fits one chip only if weights are materialized in
the executable's preferred layouts instead of being relayout-copied
inside the program.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egoscaler_tpu.runtime.layouts import (
    compile_with_auto_layouts,
    relayout_tree,
)


def _fn(params, x):
    h = x @ params["w1"]
    h = jax.nn.relu(h)
    return {"y": h @ params["w2"], "s": jnp.sum(h)}


@pytest.fixture
def setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "w1": jax.random.normal(k1, (16, 32), jnp.float32),
        "w2": jax.random.normal(k2, (32, 8), jnp.float32),
    }
    x = jax.random.normal(k3, (4, 16), jnp.float32)
    return params, x


def test_compiled_matches_plain_jit(setup):
    params, x = setup
    ref = jax.jit(_fn)(params, x)
    compiled, fmts = compile_with_auto_layouts(_fn, params, x)
    p2 = relayout_tree(params, fmts[0], delete_src=False)
    x2 = jax.device_put(x, fmts[1])
    out = compiled(p2, x2)
    np.testing.assert_allclose(
        np.asarray(out["y"]), np.asarray(ref["y"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["s"]), np.asarray(ref["s"]), rtol=1e-6
    )


def test_relayout_deletes_source(setup):
    params, x = setup
    compiled, fmts = compile_with_auto_layouts(_fn, params, x)
    # fresh tree so the fixture's buffers stay alive for other tests
    src = jax.tree_util.tree_map(lambda a: a + 0, params)
    src_leaves = jax.tree_util.tree_leaves(src)
    out = relayout_tree(src, fmts[0], delete_src=True)
    for old, new in zip(src_leaves, jax.tree_util.tree_leaves(out)):
        if new is not old:
            assert old.is_deleted()
        assert not new.is_deleted()


def test_accepts_shape_dtype_structs(setup):
    params, x = setup
    abstract_p = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
    )
    abstract_x = jax.ShapeDtypeStruct(x.shape, x.dtype)
    compiled, fmts = compile_with_auto_layouts(_fn, abstract_p, abstract_x)
    p2 = relayout_tree(params, fmts[0], delete_src=False)
    x2 = jax.device_put(x, fmts[1])
    ref = jax.jit(_fn)(params, x)
    out = compiled(p2, x2)
    np.testing.assert_allclose(
        np.asarray(out["y"]), np.asarray(ref["y"]), rtol=1e-6
    )

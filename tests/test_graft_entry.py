"""Driver-contract tests: dryrun_multichip on the virtual 8-device CPU
mesh, and entry() shape sanity via eval_shape (full compile is the
driver's job on TPU)."""
import sys

import jax
import pytest


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_traces():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    params, ids, mask, pc = args
    assert out.shape[0] == ids.shape[0]
    assert out.shape[1] == ids.shape[1]

"""HBM-peak-aware AOT compilation with automatic input layouts.

Decode-shaped programs (token-at-a-time matvecs) want every square
weight matrix in the transposed tiled layout; with default argument
layouts XLA inserts an in-program relayout copy of EVERY weight.  At
7B that is ~3.2 GiB of HLO temps on top of the 12.6 GiB argument tree
— over a single v5e chip's 15.75 GiB HBM (the reference's answer to
this class of problem is "use 8 GPUs", train.py:119-125).

The TPU-native fix: compile with ``Layout.AUTO`` inputs so the
executable declares the layouts it wants, then *materialize* the
arguments directly in those layouts.  ``relayout_tree`` converts an
existing on-device tree leaf-by-leaf, deleting each source buffer as it
goes, so peak extra HBM is one leaf (32 MiB at 7B) rather than a second
copy of the whole tree.

Works on any backend; layout differences only matter on TPU.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.tree_util as jtu
from jax.experimental.layout import Format, Layout

__all__ = ["compile_with_auto_layouts", "relayout_tree"]


def relayout_tree(tree: Any, fmt_tree: Any, *, delete_src: bool = True):
    """device_put every leaf of ``tree`` into the corresponding Format of
    ``fmt_tree`` (a prefix-compatible tree of ``Format`` objects, e.g. one
    entry of ``compiled.input_formats``).

    With ``delete_src`` (default), each source leaf is deleted as soon as
    its relayouted copy is ready: peak extra HBM = max leaf size.  Set it
    False when the caller still needs the original buffers.
    """
    leaves, treedef = jtu.tree_flatten(tree)
    fmts = treedef.flatten_up_to(fmt_tree)
    out = []
    for leaf, f in zip(leaves, fmts):
        new = jax.device_put(leaf, f)
        jax.block_until_ready(new)
        if delete_src and new is not leaf and isinstance(leaf, jax.Array):
            leaf.delete()
        out.append(new)
    return jtu.tree_unflatten(treedef, out)


def compile_with_auto_layouts(
    fn: Callable,
    *example_args: Any,
) -> Tuple[Callable, Tuple[Any, ...]]:
    """AOT-compile ``fn`` letting XLA choose every input layout.

    ``example_args`` may be concrete arrays or ShapeDtypeStructs (only
    shape/dtype are read).  Returns ``(compiled, input_formats)`` where
    ``compiled(*args)`` requires each arg already in its declared Format
    — use :func:`relayout_tree` (or ``jax.device_put``) to get it there.
    """
    jf = jax.jit(fn, in_shardings=Format(Layout.AUTO))
    abstract = jtu.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_args
    )
    compiled = jf.lower(*abstract).compile()
    arg_formats, kw_formats = compiled.input_formats
    if kw_formats:
        raise ValueError("keyword arguments are not supported")
    return compiled, arg_formats

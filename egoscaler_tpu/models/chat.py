"""Interactive point-cloud chat (PointLLM_chat.py equivalent).

Loads a point cloud (.npy, (N, 6) xyz+rgb), builds the conversation
prompt with spliced point tokens, and decodes responses with the
KV-cache generator.  `chat_once` is the programmatic API; `main` is the
REPL (models/pointllm/pointllm/eval/PointLLM_chat.py).
"""
from __future__ import annotations

import argparse
from typing import Callable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import PointLLMConfig
from egoscaler_tpu.models.conversation import conv_vicuna_v1_1
from egoscaler_tpu.models.pointbert import pc_norm
from egoscaler_tpu.models.pointllm import GenerateConfig, TrajPointLLM, generate
from egoscaler_tpu.training.dataset import HashTextTokenizer, PAD_ID


def build_chat_prompt_ids(
    cfg: PointLLMConfig,
    question: str,
    text_tokenizer: Callable[[str], List[int]],
    max_len: int = 256,
):
    """[point_start][patch xN][point_end] + question tokens, padded."""
    n_patch = cfg.point_bert.point_token_len
    ids = (
        [cfg.point_start_token_id]
        + [cfg.point_patch_token_id] * n_patch
        + [cfg.point_end_token_id]
        + text_tokenizer(question)[: max_len - n_patch - 3]
    )
    arr = np.full((max_len,), PAD_ID, np.int32)
    arr[: len(ids)] = ids
    mask = arr != PAD_ID
    # patch tokens may collide with PAD 0? point ids are >= 32000, fine
    return arr[None], mask[None]


def chat_once(
    model: TrajPointLLM,
    params,
    point_cloud: np.ndarray,
    question: str,
    decode_fn: Callable[[np.ndarray], str],
    text_tokenizer: Optional[Callable[[str], List[int]]] = None,
    max_new_tokens: int = 128,
    key: Optional[jax.Array] = None,
) -> str:
    cfg = model.cfg
    text_tokenizer = text_tokenizer or HashTextTokenizer()
    key = key if key is not None else jax.random.PRNGKey(0)
    pc = np.asarray(pc_norm(jnp.asarray(point_cloud)), np.float32)
    npts = cfg.point_bert.npoints
    if pc.shape[0] != npts:
        sel = np.random.default_rng(0).choice(
            pc.shape[0], npts, replace=pc.shape[0] < npts
        )
        pc = pc[sel]
    ids, mask = build_chat_prompt_ids(cfg, question, text_tokenizer)
    toks, lengths = generate(
        model, params, jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(pc[None]), key,
        GenerateConfig(max_new_tokens=max_new_tokens),
    )
    return decode_fn(np.asarray(toks)[0][: int(lengths[0])])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--point_cloud", required=True, help=".npy (N,6)")
    p.add_argument("--model_size", default="tiny")
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()

    cfg = PointLLMConfig()
    cfg = cfg.tiny() if args.model_size == "tiny" else cfg
    model = TrajPointLLM(cfg, remat=False)
    pc = np.load(args.point_cloud).astype(np.float32)
    dummy_ids, dummy_mask = build_chat_prompt_ids(
        cfg, "hi", HashTextTokenizer()
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(dummy_ids),
        jnp.asarray(pc[None, : cfg.point_bert.npoints]),
    )
    if args.checkpoint:
        from egoscaler_tpu.models.convert import convert_pointllm, load_torch_file

        params = convert_pointllm(load_torch_file(args.checkpoint), cfg)

    print("[chat] type a question; empty line exits")
    while True:
        q = input("USER: ").strip()
        if not q:
            break
        out = chat_once(
            model, params, pc, q, decode_fn=lambda t: f"<tokens {t.tolist()[:16]}...>"
        )
        print("ASSISTANT:", out)


if __name__ == "__main__":
    main()

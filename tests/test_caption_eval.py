"""Caption metrics + eval stage CLIs + dataset builder tests."""
import json
import os

import numpy as np
import pytest

from egoscaler_tpu.training.caption_eval import (
    LLMJudge,
    bleu,
    caption_metrics,
    classify_modelnet,
    meteor_approx,
    rouge_l,
)


def test_bleu_identity():
    out = bleu("the red cup on the table", ["the red cup on the table"])
    assert out["bleu"] > 0.99
    assert out["bleu1"] > 0.99


def test_bleu_partial():
    out = bleu("a red cup", ["the red cup on the table"])
    assert 0.0 < out["bleu"] < 0.9
    assert out["bleu1"] > 0.5


def test_rouge_and_meteor():
    assert rouge_l("the cup", ["the cup"]) == 1.0
    assert rouge_l("cup the", ["the cup"]) < 1.0
    assert meteor_approx("red cup", ["a red cup"]) > 0.5
    assert rouge_l("xyz", ["abc"]) == 0.0


def test_caption_metrics_batch():
    m = caption_metrics(
        ["a red mug", "a wooden chair"],
        [["a red mug"], ["a chair made of wood"]],
    )
    assert set(m) >= {"bleu", "bleu1", "rouge_l", "meteor"}
    assert m["bleu1"] > 0.5


class FakeChat:
    def completions(self, prompts):
        return ["T" if "mug" in p else "F" for p in prompts]


def test_llm_judge():
    judge = LLMJudge(FakeChat())
    acc = judge.accuracy(["a mug", "a dog"], ["mug", "cat"])
    assert acc == 0.5


def test_classify_modelnet():
    cats = ["night_stand", "chair", "airplane"]
    assert classify_modelnet("This looks like a chair.", cats) == 1
    assert classify_modelnet("It is a night stand", cats) == 0
    assert classify_modelnet("unclear", cats) is None


def test_build_dataset_splits(tmp_path, rng):
    from egoscaler_tpu.training.build_dataset import build_splits

    # fabricate pipeline outputs
    for i in range(10):
        for sub, ext in (("infos", ".json"), ("trajs", ".pkl"),
                         ("pcrgbs", ".npy")):
            d = tmp_path / sub / "egoexo4d" / "vid"
            os.makedirs(d, exist_ok=True)
            path = d / f"clip{i}{ext}"
            if ext == ".json":
                with open(path, "w") as f:
                    json.dump(
                        {"dataset_name": "egoexo4d", "video_uid": "vid",
                         "file_name": f"clip{i}",
                         "action_description": f"move thing {i}"}, f,
                    )
            else:
                with open(path, "wb") as f:
                    f.write(b"x")
    counts = build_splits(str(tmp_path), str(tmp_path), 0.2, 0.2)
    assert counts["train"] == 6 and counts["val"] == 2 and counts["test"] == 2
    with open(tmp_path / "train.json") as f:
        coco = json.load(f)
    assert len(coco["images"]) == 6
    assert coco["annotations"][0]["action_description"].startswith("move")


def test_eval_stages_cli_flow(tmp_path):
    """HOT3D eval stages 2-4 over a synthetic sequence."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_hot3d_eval import write_sequence
    from egoscaler_tpu.data.eval.stages import (
        stage2_manipulated_object,
        stage3_desc_timestamp,
        stage4_gt_trajectory,
    )

    seq_root = tmp_path / "seqs"
    os.makedirs(seq_root, exist_ok=True)
    seq, ts0, dt = write_sequence(seq_root, n_frames=100)
    data_dir = str(tmp_path / "out")

    infos = stage2_manipulated_object(data_dir, [seq])
    assert len(infos) >= 1
    assert infos[0]["object_id"] == "obj_a"

    updated = stage3_desc_timestamp(data_dir)
    assert updated and "start_sec" in updated[0]
    assert "obj_a" in updated[0]["action_description"]

    n = stage4_gt_trajectory(data_dir, str(seq_root))
    assert n >= 1
    import pickle
    from glob import glob

    pkl = glob(os.path.join(data_dir, "trajs", "hot3d", "*", "*.pkl"))[0]
    with open(pkl, "rb") as f:
        traj = pickle.load(f)
    assert traj["traj_quat"].shape[1] == 7
    assert traj["init_bbox"].shape == (8, 3)


def test_jax_sentence_encoder_properties():
    """Embedding similarity: identical sentences score 100, disjoint
    sentences score lower; scores are symmetric."""
    from egoscaler_tpu.models.grounding_dino import BertConfig
    from egoscaler_tpu.training.caption_eval import (
        JaxSentenceEncoder,
        embedding_similarity,
    )

    enc = JaxSentenceEncoder(cfg=BertConfig().tiny(), max_len=16)
    same = embedding_similarity(
        ["a red mug on the table"], ["a red mug on the table"], enc
    )
    assert abs(same - 100.0) < 1e-3, same
    diff = embedding_similarity(
        ["a red mug on the table"], ["seventeen purple elephants"], enc
    )
    assert diff < same
    ab = embedding_similarity(["alpha beta"], ["gamma delta"], enc)
    ba = embedding_similarity(["gamma delta"], ["alpha beta"], enc)
    assert abs(ab - ba) < 1e-3


def test_bert_encoder_hf_parity():
    """convert_bert_encoder loads a real (random-init, offline) HF
    BertModel and reproduces its last_hidden_state."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax.numpy as jnp
    from flax import traverse_util

    from egoscaler_tpu.models.convert import convert_bert_encoder
    from egoscaler_tpu.models.grounding_dino import (
        BertConfig,
        BertTextEncoder,
    )

    hf_cfg = transformers.BertConfig(
        vocab_size=1100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = BertConfig().tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "max_position_embeddings": 64})
    model = BertTextEncoder(cfg)
    params = traverse_util.unflatten_dict(convert_bert_encoder(sd), sep="/")

    ids = np.array([[101, 200, 300, 400, 102, 0, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], bool)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    allow = mask[:, None, :] & mask[:, :, None]
    pos = np.broadcast_to(np.arange(ids.shape[1]), ids.shape)
    ours = np.asarray(
        model.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(allow),
            jnp.zeros_like(jnp.asarray(ids, jnp.int32)),
            jnp.asarray(pos.copy(), jnp.int32),
        )
    )
    np.testing.assert_allclose(
        ours[mask], ref[mask], atol=2e-4, rtol=1e-3
    )

"""Few-shot dialog prompt templates (data/prompt/*.json parity)."""
import json

import pytest

from egoscaler_tpu.pipelines.llm import RuleBasedAnnotator
from egoscaler_tpu.pipelines.prompts import (
    DEFAULT_FILTER_DIALOG,
    DEFAULT_OBJECT_DIALOG,
    load_dialog,
    render_dialog,
)


def test_load_dialog_reference_schema(tmp_path):
    # exactly the reference file schema
    # (data/prompt/filtering_candidate.json): role/content turn list
    dialog = [
        {"role": "system", "content": "Judge object interaction."},
        {"role": "user", "content": "stack the plates."},
        {"role": "assistant", "content": "True"},
    ]
    p = tmp_path / "prompt.json"
    p.write_text(json.dumps(dialog))
    assert load_dialog(str(p)) == dialog


def test_load_dialog_rejects_bad_role(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps([{"role": "oracle", "content": "x"}]))
    with pytest.raises(ValueError):
        load_dialog(str(p))


def test_render_plain_ends_with_query():
    out = render_dialog(DEFAULT_FILTER_DIALOG, "lift the kettle.")
    lines = out.splitlines()
    assert lines[0].startswith("SYSTEM: ")
    assert lines[-1] == "USER: lift the kettle."
    # few-shot examples present
    assert sum(line.startswith("ASSISTANT: ") for line in lines) >= 3


def test_render_llama3_template():
    out = render_dialog(
        DEFAULT_OBJECT_DIALOG, "move the cup.", style="llama3"
    )
    assert out.startswith("<|begin_of_text|>")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert "<|eot_id|>" in out
    assert "move the cup." in out


def test_rule_annotator_parses_fewshot_filter_prompt():
    ann = RuleBasedAnnotator()
    good = render_dialog(DEFAULT_FILTER_DIALOG, "place the mug on the shelf.")
    bad = render_dialog(DEFAULT_FILTER_DIALOG, "walk to the door.")
    assert ann.completions([good]) == ["True"]
    assert ann.completions([bad]) == ["False"]


def test_rule_annotator_parses_fewshot_object_prompt():
    ann = RuleBasedAnnotator()
    p = render_dialog(DEFAULT_OBJECT_DIALOG, "grab the hammer from the shelf.")
    (out,) = ann.completions([p])
    assert "manipulated object: " in out and "rigid: true" in out
    assert "hammer" in out

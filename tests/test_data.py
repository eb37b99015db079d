"""Dataset utility tests: json2token/token2json round trip, edit distance,
and the train collate (token types, labels, padding)."""

import json

import numpy as np
import pytest

from paligemma_tpu.train.data import (
    collate,
    json2token,
    normalized_edit_distance,
    token2json,
)
from paligemma_tpu.processing.processor import PaliGemmaProcessor

from test_processing import StubTokenizer, _random_image


def test_json2token_roundtrip_flat():
    obj = {"total": "1000", "menu": ["burger", "fries"]}
    s = json2token(obj, sort_json_key=True)
    assert s == "<s_total>1000</s_total><s_menu>burger<sep/>fries</s_menu>"
    back = token2json(s)
    assert back == {"total": "1000", "menu": ["burger", "fries"]}


def test_json2token_roundtrip_nested():
    obj = {"menu": {"nm": "latte", "price": "4.00"}}
    s = json2token(obj)
    back = token2json(s)
    assert back == {"menu": {"nm": "latte", "price": "4.00"}}


def test_edit_distance_matches_known_values():
    assert normalized_edit_distance("abc", "abc") == 0.0
    assert normalized_edit_distance("", "") == 0.0
    assert normalized_edit_distance("kitten", "sitting") == 3 / 7
    assert normalized_edit_distance("a", "") == 1.0


def test_collate_shapes_and_masks():
    tok = StubTokenizer()
    proc = PaliGemmaProcessor(tok, num_image_tokens=2, image_size=28)
    batch = collate(
        proc,
        images=[_random_image(0), _random_image(1)],
        prompts=["extract JSON.", "extract JSON."],
        targets=["<s_total>10</s_total>", "<s_total>3</s_total> extra words"],
        pad_to_multiple=8,
    )
    b, s = batch["input_ids"].shape
    assert b == 2 and s % 8 == 0
    assert batch["pixel_values"].shape == (2, 3, 28, 28)
    # prefix tokens are type 0 and unlabeled
    assert (batch["labels"][batch["token_type_ids"] == 0] == -100).all()
    # suffix tokens are labeled with their own ids
    sfx = batch["token_type_ids"] == 1
    np.testing.assert_array_equal(batch["labels"][sfx], batch["input_ids"][sfx])
    # suffix ends with EOS before padding
    row_len = batch["attention_mask"][0].sum()
    assert batch["input_ids"][0, row_len - 1] == tok.eos_token_id
    # padding is masked
    assert (batch["labels"][batch["attention_mask"] == 0] == -100).all()


def test_collate_eval_mode_no_labels():
    tok = StubTokenizer()
    proc = PaliGemmaProcessor(tok, num_image_tokens=2, image_size=28)
    batch = collate(proc, [_random_image(0)], ["caption"], targets=None)
    assert "labels" not in batch
    assert (batch["token_type_ids"] == 0).all()


def test_hf_dataset_adapter_targets():
    """CORD-convention ground_truth handling: gt_parse, gt_parses (first
    parse wins), and plain target columns (ref: Paligemma_FT.ipynb cell 20)."""
    datasets = pytest.importorskip("datasets")
    from paligemma_tpu.train.hf_dataset import HFDatasetAdapter

    ds = datasets.Dataset.from_dict({
        "image": ["a.png", "b.png", "c.png"],
        "ground_truth": [
            json.dumps({"gt_parse": {"total": "10", "menu": {"nm": "x"}}}),
            json.dumps({"gt_parses": [{"total": "11"}, {"total": "zz"}]}),
            json.dumps({"unwrapped": "raw"}),  # no gt_parse key -> whole dict
        ],
    })
    ad = HFDatasetAdapter(ds, prompt="extract JSON.")
    assert len(ad) == 3
    r0 = ad[0]
    assert r0["prompt"] == "extract JSON."
    assert r0["target"] == "<s_total>10</s_total><s_menu><s_nm>x</s_nm></s_menu>"
    assert ad[1]["target"] == "<s_total>11</s_total>"  # first parse wins
    assert ad[2]["target"] == "<s_unwrapped>raw</s_unwrapped>"

    ds2 = datasets.Dataset.from_dict({
        "image": ["a.png"], "target": ["already a string"],
    })
    assert HFDatasetAdapter(ds2)[0]["target"] == "already a string"
    assert [r["target"] for r in HFDatasetAdapter(ds2).rows()] == [
        "already a string"
    ]

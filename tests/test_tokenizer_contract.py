"""Offline pin of the REAL gemma/PaliGemma tokenizer contract.

The weights-gated module (tests/test_real_checkpoint.py) checks tokenizer
fidelity against the actual 6 GB checkpoint, but auto-skips without it.
This module rebuilds the real checkpoint's *token-id geometry* with the
``tokenizers`` library — no SentencePiece model needed — and asserts the
exact gemma-string sequence the processor must produce (SURVEY "hard
parts" #4; ref: /root/reference/processing_paligemma.py:77-145).

Real google/paligemma-3b-pt-224 tokenizer layout (gemma SentencePiece base
of 256,000 pieces + the task tokens the checkpoint ships pre-added):

    <pad>=0  <eos>=1  <bos>=2
    <loc0000>..<loc1023> = 256000..257023   (detection bins)
    <seg000>..<seg127>   = 257024..257151   (mask-VQ codes)
    <image>              = 257152           (== config.image_token_index)

The reference constructs these by adding tokens to a bare gemma tokenizer
(ref: processing_paligemma.py:129-145); on the real checkpoint they already
exist, so the processor's add calls MUST be id-stable no-ops — also pinned
here.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from paligemma_tpu.processing.processor import IMAGE_TOKEN, PaliGemmaProcessor

BASE_VOCAB = 256000
LOC0, SEG0, IMAGE_ID = 256000, 257024, 257152
NL_ID = 4
WORDS = {"describe": 5, "the": 6, "image": 7, "detect": 8, "cat": 9}


@pytest.fixture(scope="module")
def gemma_tok():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "<unk>": 3, "\n": NL_ID}
    vocab.update(WORDS)
    for i in range(len(vocab), BASE_VOCAB):  # filler for the SP pieces
        vocab[f"<unused{i}>"] = i
    for i in range(1024):
        vocab[f"<loc{i:04d}>"] = LOC0 + i
    for i in range(128):
        vocab[f"<seg{i:03d}>"] = SEG0 + i
    vocab[IMAGE_TOKEN] = IMAGE_ID
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    # keep "\n" a real token (the gemma string ends in one); spaces split
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split("\n", behavior="isolated"),
        pre_tokenizers.Split(" ", behavior="removed"),
    ])
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="<eos>",
        bos_token="<bos>", unk_token="<unk>",
    )
    # the real checkpoint ships these PRE-ADDED (tokenizer_config.json
    # added_tokens); register them so they split atomically, ids unchanged
    fast.add_special_tokens({"additional_special_tokens": [IMAGE_TOKEN]})
    fast.add_tokens([f"<loc{i:04d}>" for i in range(1024)]
                    + [f"<seg{i:03d}>" for i in range(128)])
    return fast


@pytest.fixture(scope="module")
def processor(gemma_tok):
    return PaliGemmaProcessor(gemma_tok, num_image_tokens=4, image_size=28)


def _img(seed=0):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 256, (28, 28, 3), dtype=np.uint8)
    )


def test_special_token_geometry(gemma_tok):
    """The exact ids golden parity depends on (config.image_token_index ==
    257152 in the shipped config.json; loc/seg blocks used by
    processing/detection.py round-trips)."""
    assert gemma_tok.convert_tokens_to_ids("<pad>") == 0
    assert gemma_tok.convert_tokens_to_ids("<eos>") == 1
    assert gemma_tok.convert_tokens_to_ids("<bos>") == 2
    assert gemma_tok.convert_tokens_to_ids("<loc0000>") == 256000
    assert gemma_tok.convert_tokens_to_ids("<loc1023>") == 257023
    assert gemma_tok.convert_tokens_to_ids("<seg000>") == 257024
    assert gemma_tok.convert_tokens_to_ids("<seg127>") == 257151
    assert gemma_tok.convert_tokens_to_ids(IMAGE_TOKEN) == 257152
    assert len(gemma_tok) == 257153


def test_processor_is_id_stable_on_preadded_tokenizer(gemma_tok, processor):
    """PaliGemmaProcessor re-adds <image>/loc/seg (the reference's bare-
    gemma path, ref: 129-145); on a checkpoint tokenizer that already has
    them this must not mint new ids or grow the vocab."""
    assert len(gemma_tok) == 257153
    assert gemma_tok.image_token_id == IMAGE_ID
    assert gemma_tok.convert_tokens_to_ids("<loc0000>") == LOC0
    assert gemma_tok.convert_tokens_to_ids(IMAGE_TOKEN) == IMAGE_ID


def test_gemma_string_exact_sequence(processor):
    """<image>*N + <bos> + prompt + trailing-\\n, tokenized as ONE string
    (HF convention: the newline rides the same tokenizer call so real
    SentencePiece may merge it; ref: processing_paligemma.py:77-89),
    no EOS, right padding."""
    batch = processor([_img()], ["describe the image"])
    ids = batch["input_ids"]
    mask = batch["attention_mask"]
    want = [IMAGE_ID] * 4 + [2, WORDS["describe"], WORDS["the"],
                             WORDS["image"], NL_ID]
    assert ids.shape == (1, len(want))
    np.testing.assert_array_equal(ids[0], want)
    np.testing.assert_array_equal(mask[0], np.ones(len(want)))
    assert batch["pixel_values"].shape == (1, 3, 28, 28)


def test_right_padding_batch(processor):
    """Uneven prompts right-pad with <pad>=0 and mask 0 (the framework
    invariant enforced at processor construction)."""
    batch = processor([_img(), _img(1)], ["describe the image", "detect cat"])
    ids, mask = batch["input_ids"], batch["attention_mask"]
    assert ids.shape[0] == 2
    row1_len = 4 + 1 + 2 + 1  # image*4 bos "detect cat" \n
    np.testing.assert_array_equal(
        ids[1, :row1_len],
        [IMAGE_ID] * 4 + [2, WORDS["detect"], WORDS["cat"], NL_ID],
    )
    assert (ids[1, row1_len:] == 0).all()
    assert (mask[1, row1_len:] == 0).all()
    assert (mask[0] == 1).all()  # longer row fully valid


def test_detection_tokens_roundtrip_real_ids(gemma_tok):
    """Model-emitted loc/seg ids decode to the strings parse_detections
    consumes, at the real id offsets."""
    from paligemma_tpu.processing.detection import extract_objects

    ids = [LOC0 + 10, LOC0 + 20, LOC0 + 500, LOC0 + 1000] + [
        SEG0 + c for c in (0, 5, 127, 64) * 4
    ]
    text = gemma_tok.decode(ids, skip_special_tokens=False)
    # fast decode inserts spaces between added tokens; the parser is
    # whitespace-tolerant by design
    dets = extract_objects(text + " cat")
    assert len(dets) == 1
    assert dets[0].box == (10 / 1024, 20 / 1024, 500 / 1024, 1000 / 1024)
    assert dets[0].seg_indices == (0, 5, 127, 64) * 4
    assert dets[0].label == "cat"

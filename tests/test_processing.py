"""Processor + image-pipeline tests (incl. a stub tokenizer standing in for
the SentencePiece gemma tokenizer, which is not available offline)."""

import numpy as np
import pytest

import jax.numpy as jnp

from paligemma_tpu.processing.images import preprocess_device, process_images_host
from paligemma_tpu.processing.processor import IMAGE_TOKEN, PaliGemmaProcessor

PIL = pytest.importorskip("PIL")
from PIL import Image


def _random_image(seed, size=(64, 48)):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8))


def test_host_pipeline_matches_reference_math():
    """Shape (B,C,H,W), range [-1, 1] (ref: processing_paligemma.py:216-227)."""
    out = process_images_host([_random_image(0)], image_size=32)
    assert out.shape == (1, 3, 32, 32)
    assert out.max() <= 1.0 + 1e-6 and out.min() >= -1.0 - 1e-6

    # the math: normalize((x/255), 0.5, 0.5) == x/127.5 - 1
    img = _random_image(1, (32, 32))  # no resize needed
    out = process_images_host([img], image_size=32)
    want = (np.asarray(img).astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[0], want.transpose(2, 0, 1), atol=1e-6)


def test_device_pipeline_close_to_host():
    """Jitted device path approximates the PIL path (both bicubic)."""
    img = _random_image(3, (56, 56))
    host = process_images_host([img], image_size=28)
    dev = np.asarray(
        preprocess_device(jnp.asarray(np.asarray(img))[None], image_size=28)
    )
    assert dev.shape == host.shape
    # different bicubic implementations: close, not identical
    assert np.abs(dev - host).mean() < 0.03


class StubTokenizer:
    """Minimal HF-tokenizer-compatible stub (whitespace tokens)."""

    bos_token = "<bos>"
    eos_token_id = 1

    def __init__(self):
        self.vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "\n": 3}
        self.add_eos_token = True
        self.add_bos_token = True

    def add_special_tokens(self, d):
        for t in d.get("additional_special_tokens", []):
            self.vocab.setdefault(t, len(self.vocab))

    def add_tokens(self, toks):
        for t in toks:
            self.vocab.setdefault(t, len(self.vocab))

    def convert_tokens_to_ids(self, tok):
        return self.vocab[tok]

    def _encode(self, s):
        ids = []
        while s:
            if s.startswith(IMAGE_TOKEN):
                ids.append(self.vocab[IMAGE_TOKEN]); s = s[len(IMAGE_TOKEN):]
            elif s.startswith(self.bos_token):
                ids.append(self.vocab["<bos>"]); s = s[len(self.bos_token):]
            elif s.startswith("\n"):
                ids.append(self.vocab["\n"]); s = s[1:]
            elif s.startswith(" "):
                s = s[1:]
            else:
                w = s.split(" ")[0].split("\n")[0]
                self.vocab.setdefault(w, len(self.vocab))
                ids.append(self.vocab[w]); s = s[len(w):]
        return ids

    def __call__(self, texts, return_tensors="np", truncation=True, padding="longest"):
        seqs = [self._encode(t) for t in texts]
        maxlen = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), maxlen), np.int64)
        mask = np.zeros((len(seqs), maxlen), np.int64)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_processor_gemma_string_and_tokens():
    tok = StubTokenizer()
    proc = PaliGemmaProcessor(tok, num_image_tokens=4, image_size=28)

    # token registration (ref: processing_paligemma.py:129-145)
    assert IMAGE_TOKEN in tok.vocab
    assert "<seg000>" in tok.vocab and "<seg127>" in tok.vocab
    assert "<loc0000>" in tok.vocab and "<loc1023>" in tok.vocab
    assert tok.image_token_id == tok.vocab[IMAGE_TOKEN]
    assert tok.add_bos_token is False and tok.add_eos_token is False

    s = proc.build_prompt("describe this")
    assert s == IMAGE_TOKEN * 4 + "<bos>" + "describe this\n"

    out = proc(images=[_random_image(0)], text=["hello world"])
    assert out["pixel_values"].shape == (1, 3, 28, 28)
    ids = out["input_ids"][0]
    img_id = tok.image_token_id
    assert list(ids[:4]) == [img_id] * 4
    assert ids[4] == tok.vocab["<bos>"]
    assert ids[-1] == tok.vocab["\n"]
    assert out["attention_mask"].all()


def test_processor_batch_padding():
    """Batched prompts pad to longest — beyond the reference's B==1 assert."""
    tok = StubTokenizer()
    proc = PaliGemmaProcessor(tok, num_image_tokens=2, image_size=28)
    out = proc(
        images=[_random_image(0), _random_image(1)],
        text=["one two three", "one"],
    )
    assert out["input_ids"].shape == out["attention_mask"].shape
    assert out["input_ids"].shape[0] == 2
    assert out["attention_mask"][0].all()
    assert out["attention_mask"][1].sum() < out["attention_mask"][0].sum()


def test_processor_forces_right_padding():
    """A real HF tokenizer configured for LEFT padding must not leak
    left-padded batches into the engine (write_pos / last-token logits /
    flash contiguous-prefix all assume right padding; the reference asserts
    padding_side at load, ref: utils.py:12 — we enforce it at the source)."""
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "\n": 3, "<unk>": 4,
             "hello": 5, "world": 6, "building": 7}
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=t, pad_token="<pad>", eos_token="<eos>",
        bos_token="<bos>", unk_token="<unk>", padding_side="left",
    )
    proc = PaliGemmaProcessor(tok, num_image_tokens=4, image_size=28)
    assert proc.tokenizer.padding_side == "right"

    out = proc(
        images=[_random_image(0), _random_image(1)],
        text=["hello", "hello world building"],
    )
    mask = out["attention_mask"]
    for row in mask:  # right padding: every row is 1...1 0...0
        nz = np.nonzero(row)[0]
        assert nz[0] == 0 and (np.diff(nz) == 1).all()
    assert mask[0].sum() < mask[1].sum()

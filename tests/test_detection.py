"""Detection / segmentation postprocessing tests.

The reference registers the <loc####>/<seg###> task tokens
(ref: processing_paligemma.py:129-145) but ships no decoder for the
strings a fine-tuned model emits; these tests cover our closing of that
loop (processing/detection.py, processing/mask_vae.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paligemma_tpu.processing import detection as det
from paligemma_tpu.processing import mask_vae


def test_extract_single_box():
    text = "<loc0000><loc0256><loc0512><loc1023> cat"
    objs = det.extract_objects(text)
    assert len(objs) == 1
    o = objs[0]
    assert o.label == "cat"
    assert o.seg_indices is None
    # public demo convention: bin/1024 normalized, floor*dim pixels
    np.testing.assert_allclose(
        o.box, (0.0, 256 / 1024, 512 / 1024, 1023 / 1024), atol=1e-9
    )
    y0, x0, y1, x1 = o.box_pixels(224, 448)
    assert (y0, x1) == (0, int(1023 / 1024 * 448))
    assert y1 == int(512 / 1024 * 224)


def test_extract_multiple_and_prompt_prefix_ignored():
    text = (
        "detect cat ; dog\n"
        "<loc0010><loc0020><loc0100><loc0200> cat ; "
        "<loc0300><loc0400><loc0500><loc0600> dog"
    )
    objs = det.extract_objects(text)
    assert [o.label for o in objs] == ["cat", "dog"]


def test_extract_segmentation_tokens():
    segs = "".join(f"<seg{i:03d}>" for i in range(0, 32, 2))
    text = f"<loc0001><loc0002><loc0003><loc0004>{segs} wing"
    (o,) = det.extract_objects(text)
    assert o.label == "wing"
    assert o.seg_indices == tuple(range(0, 32, 2))


def test_malformed_fragments_skipped():
    # only 3 loc tokens -> not an object
    assert det.extract_objects("<loc0001><loc0002><loc0003> junk") == []
    assert det.extract_objects("no tokens at all") == []


def test_format_extract_roundtrip():
    objs = [
        det.Detection(box=(0.1, 0.2, 0.3, 0.4), label="cat"),
        det.Detection(
            box=(0.0, 0.0, 1.0, 1.0),
            label="sky",
            seg_indices=tuple(range(16)),
        ),
    ]
    text = det.format_objects(objs)
    back = det.extract_objects(text)
    assert [o.label for o in back] == ["cat", "sky"]
    assert back[1].seg_indices == tuple(range(16))
    for a, b in zip(objs, back):
        np.testing.assert_allclose(a.box, b.box, atol=1.0 / 1023)


def test_boxes_array_and_box_masks():
    objs = det.extract_objects(
        "<loc0000><loc0000><loc1023><loc1023> all ; "
        "<loc0000><loc0000><loc0000><loc0000> dot"
    )
    boxes = det.boxes_array(objs, 64, 64)
    assert boxes.shape == (2, 4)
    masks = det.render_box_masks(objs, 64, 64)
    assert masks[0].all()  # full-image box
    assert masks[1].sum() == 1  # single pixel at the origin


def test_paste_mask_in_box_full_canvas():
    mask64 = np.ones((64, 64), np.float32)
    out = det.paste_mask_in_box(mask64, (0.0, 0.0, 1.0, 1.0), 128, 96)
    assert out.shape == (128, 96)
    assert out.all()
    # half-intensity mask under 0.5 threshold -> empty
    out2 = det.paste_mask_in_box(mask64 * 0.25, (0.0, 0.0, 1.0, 1.0), 32, 32)
    assert out2.sum() == 0


def test_paste_mask_in_box_is_bilinear():
    # Gradient along y: resized values must stay monotone, endpoints exact.
    mask64 = np.tile(np.linspace(0, 1, 64)[:, None], (1, 64)).astype(np.float32)
    out = det.paste_mask_in_box(mask64, (0.0, 0.0, 1.0, 1.0), 200, 16,
                                threshold=0.5)
    col = out[:, 0]
    # threshold at 0.5 -> bottom half set, top half clear, single transition
    assert col[0] == 0 and col[-1] == 1
    assert np.all(np.diff(col.astype(np.int32)) >= 0)


def test_mask_vae_shapes_and_jit():
    params = mask_vae.init_params(jax.random.PRNGKey(0), embedding_dim=32)
    idx = jnp.asarray(np.arange(32).reshape(2, 16) % 128, jnp.int32)
    out = jax.jit(mask_vae.reconstruct_masks)(params, idx)
    assert out.shape == (2, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
    unit = mask_vae.to_unit_range(np.asarray(out))
    assert unit.min() >= 0.0 and unit.max() <= 1.0


def test_mask_vae_loads_torch_layout_npz(tmp_path):
    """Fabricate a vae-oid.npz with the official torch key layout and check
    the loader maps it to a working decoder of the right geometry."""
    rng = np.random.default_rng(0)
    D = 24
    ckpt = {"_vq_vae._embedding": rng.normal(size=(128, D)).astype(np.float32)}

    def conv(name, cin, cout, k):
        ckpt[f"{name}.weight"] = rng.normal(
            size=(cout, cin, k, k)
        ).astype(np.float32) * 0.05
        ckpt[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def convt(name, cin, cout):
        # torch ConvTranspose2d weight: (in, out, kh, kw)
        ckpt[f"{name}.weight"] = rng.normal(
            size=(cin, cout, 4, 4)
        ).astype(np.float32) * 0.05
        ckpt[f"{name}.bias"] = np.zeros((cout,), np.float32)

    conv("decoder.0", D, 128, 1)
    for r in (2, 3):
        conv(f"decoder.{r}.net.0", 128, 128, 3)
        conv(f"decoder.{r}.net.2", 128, 128, 3)
        conv(f"decoder.{r}.net.4", 128, 128, 1)
    cin = 128
    for i, cout in zip((4, 6, 8, 10), (128, 64, 32, 16)):
        convt(f"decoder.{i}", cin, cout)
        cin = cout
    conv("decoder.12", 16, 1, 1)

    path = tmp_path / "vae-oid.npz"
    np.savez(path, **ckpt)
    params = mask_vae.load_vae_oid_npz(str(path))
    out = mask_vae.reconstruct_masks(params, jnp.zeros((1, 16), jnp.int32))
    assert out.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_mask_vae_convtranspose_doubles_resolution():
    """The 4 upsample stages must take the 4x4 latent exactly to 64x64 —
    this pins the lax.conv_transpose padding semantics (dilate by 2, pad 2,
    k=4) against regressions."""
    params = mask_vae.init_params(jax.random.PRNGKey(1), embedding_dim=8)
    idx = jnp.zeros((1, 16), jnp.int32)
    out = mask_vae.reconstruct_masks(params, idx)
    assert out.shape == (1, 64, 64)


def test_detection_tokens_match_processor_vocabulary():
    """format_objects only emits tokens the processor registers (128 seg,
    1024 loc) — guards the two modules drifting apart."""
    o = det.Detection(box=(0.0, 0.0, 1.0, 1.0), label="x",
                      seg_indices=tuple([127] * 16))
    text = det.format_objects([o])
    assert "<loc1023>" in text and "<seg127>" in text
    assert "<loc1024>" not in text

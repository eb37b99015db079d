"""Detection / segmentation postprocessing demo (offline).

Shows the full loc/seg decoding pipeline on a synthetic model output —
the string a detection-tuned PaliGemma emits for
``detect cat ; segment dog`` style prompts. With a real fine-tuned
checkpoint you'd get this string from ``cli.infer --decode_detections``;
here it's constructed so the demo runs without weights.

    python examples/detect_demo.py [--vae path/to/vae-oid.npz]

Outputs (./detect_demo_out/): boxes.json and one mask PNG per object.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from paligemma_tpu.processing import detection as det
from paligemma_tpu.processing import mask_vae


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae", default=None,
                   help="official vae-oid.npz for demo-parity masks "
                        "(random decoder weights otherwise)")
    p.add_argument("--out_dir", default="detect_demo_out")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    args = p.parse_args()

    # The model-output string: one plain box + one segmented object.
    text = (
        "<loc0102><loc0205><loc0716><loc0819> cat ; "
        "<loc0307><loc0410><loc0921><loc1000>"
        + "".join(f"<seg{i:03d}>" for i in range(0, 48, 3))
        + " dog"
    )
    print(f"model output:\n  {text}\n")

    objs = det.extract_objects(text)
    os.makedirs(args.out_dir, exist_ok=True)
    H, W = args.height, args.width

    boxes = [
        {"label": o.label, "box_yxyx": list(o.box_pixels(H, W)),
         "has_mask": o.seg_indices is not None}
        for o in objs
    ]
    with open(os.path.join(args.out_dir, "boxes.json"), "w") as f:
        json.dump(boxes, f, indent=2)
    print(json.dumps(boxes, indent=2))

    if args.vae:
        vae = mask_vae.load_vae_oid_npz(args.vae)
    else:
        print("\n(no --vae given: using random decoder weights — masks are "
              "shape-correct but not meaningful)")
        vae = mask_vae.init_params(jax.random.PRNGKey(0))

    try:
        from PIL import Image
    except ImportError:
        Image = None

    for i, o in enumerate(objs):
        if o.seg_indices is None:
            m = det.render_box_masks([o], H, W)[0]
        else:
            import jax.numpy as jnp

            logits = mask_vae.reconstruct_masks(
                vae, jnp.asarray([o.seg_indices], jnp.int32)
            )
            soft = mask_vae.to_unit_range(np.asarray(logits[0]))
            m = det.paste_mask_in_box(soft.astype(np.float32), o.box, H, W)
        path = os.path.join(args.out_dir, f"mask_{i}_{o.label}.png")
        if Image is not None:
            Image.fromarray((m * 255).astype(np.uint8)).save(path)
            print(f"wrote {path} ({int(m.sum())} px set)")
        else:
            np.save(path.replace(".png", ".npy"), m)


if __name__ == "__main__":
    main()

"""Inference CLI.

Mirrors the reference entrypoint and its flags (ref: inference.py:109-154,
launched by launch_inference.sh): load an HF checkpoint directory, process
one or more images + prompts, generate with greedy or temperature/top-p
sampling, print prompt + decoded continuation.

TPU-native differences: the model runs jitted on the default JAX device
(the reference force-pins to CPU, ref: inference.py:127), supports batches,
bf16 weights, and optional int8 weight-only quantization for serving.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from .errors import user_errors

    with user_errors():
        _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser(description="PaliGemma TPU inference")
    p.add_argument("--model_path", required=True, help="HF checkpoint directory")
    p.add_argument("--prompt", required=True, action="append",
                   help="prefix prompt (repeat for a batch)")
    p.add_argument("--image_file_path", required=True, action="append",
                   help="image path (repeat for a batch)")
    p.add_argument("--max_tokens_to_generate", type=int, default=100)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--do_sample", action="store_true")
    p.add_argument("--only_cpu", action="store_true")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--int8_prefill", action="store_true",
                   help="prefill from the int8 tree too (single weight "
                        "copy in HBM; W8A8 MXU prefill). Requires "
                        "--quantize_int8")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8 weight-only quantization of the decoder")
    p.add_argument("--max_seq_len", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel over a Mesh('data','model'); on a "
                        "v5e-8 slice use --model_parallel 8")
    p.add_argument("--speculative", action="store_true",
                   help="n-gram speculative decoding (greedy, single "
                        "image/prompt): propose draft tokens from the "
                        "prompt/history on device and verify them in one "
                        "forward — identical tokens, faster on repetitive "
                        "outputs (runtime.engine.generate_spec)")
    p.add_argument("--draft_k", type=int, default=8,
                   help="draft tokens proposed per speculative cycle")
    p.add_argument("--decode_detections", action="store_true",
                   help="parse <loc####>/<seg###> tokens in the output "
                        "('detect ...' / 'segment ...' prompts) and print "
                        "one JSON line of pixel boxes per image")
    args = p.parse_args(argv)

    if args.only_cpu:
        jax.config.update("jax_platforms", "cpu")

    from PIL import Image
    from transformers import AutoTokenizer

    from ..checkpoints.hf_loader import load_hf_model
    from ..processing.processor import PaliGemmaProcessor
    from ..runtime.engine import PaliGemmaEngine
    from ..runtime.quantize import quantize_lm_for_serving

    print(f"Device in use: {jax.devices()[0]}")
    print("Loading model")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, config = load_hf_model(args.model_path, dtype)
    # split precision: bf16 weights for the compute-bound prefill, int8 for
    # the bandwidth-bound decode (~1.8x decode tokens/s on v5e)
    decode_params = quantize_lm_for_serving(params) if args.quantize_int8 else None

    tokenizer = AutoTokenizer.from_pretrained(args.model_path, padding_side="right")
    processor = PaliGemmaProcessor(
        tokenizer,
        num_image_tokens=config.vision_config.num_image_tokens,
        image_size=config.vision_config.image_size,
    )
    mesh = None
    if args.data_parallel * args.model_parallel > 1:
        from ..core.mesh import make_mesh

        mesh = make_mesh(args.data_parallel, args.model_parallel)
    from .errors import require

    prompts = list(args.prompt)
    require(
        len(args.image_file_path) == len(prompts),
        f"got {len(prompts)} --prompt but {len(args.image_file_path)} "
        "--image_file_path; pass one image per prompt",
    )
    images = [Image.open(f) for f in args.image_file_path]
    inputs = processor(images=images, text=prompts)

    # grow the cache to fit prompt + budget (the reference's torch.cat cache
    # grows unboundedly, ref: modeling_gemma.py:54-55; ours is preallocated,
    # so size it up front instead of silently clamping writes)
    need = inputs["input_ids"].shape[1] + args.max_tokens_to_generate
    max_seq_len = max(args.max_seq_len, ((need + 127) // 128) * 128)
    int8_act_prefill = False
    if getattr(args, "int8_prefill", False):
        require(args.quantize_int8, "--int8_prefill requires --quantize_int8")
        params = decode_params  # single-copy: the bf16 tree is dropped
        int8_act_prefill = True
    engine = PaliGemmaEngine(
        params, config,
        max_seq_len=max_seq_len,
        eos_token_id=tokenizer.eos_token_id,
        decode_params=decode_params,
        mesh=mesh,
        int8_act_prefill=int8_act_prefill,
    )
    print("Running inference")
    if args.speculative:
        require(not args.do_sample,
                "--speculative is greedy-only; drop --do_sample")
        require(len(prompts) == 1,
                "--speculative serves one image/prompt at a time")
        tokens = engine.generate_spec(
            jnp.asarray(inputs["pixel_values"]),
            jnp.asarray(inputs["input_ids"]),
            jnp.asarray(inputs["attention_mask"]),
            max_new_tokens=args.max_tokens_to_generate,
            draft_k=args.draft_k,
        )
    else:
        tokens = engine.generate(
            jnp.asarray(inputs["pixel_values"]),
            jnp.asarray(inputs["input_ids"]),
            jnp.asarray(inputs["attention_mask"]),
            max_new_tokens=args.max_tokens_to_generate,
            temperature=args.temperature,
            top_p=args.top_p,
            do_sample=args.do_sample,
            key=jax.random.PRNGKey(args.seed),
        )
    for prompt, row, image in zip(prompts, tokens, images):
        decoded = tokenizer.decode(row, skip_special_tokens=True)
        print(prompt + decoded)
        if args.decode_detections:
            import json

            from ..processing.detection import extract_objects

            w, h = image.size
            objs = [
                {
                    "label": o.label,
                    "box_yxyx": list(o.box_pixels(h, w)),
                    "has_mask": o.seg_indices is not None,
                }
                for o in extract_objects(decoded)
            ]
            print(json.dumps(objs))


if __name__ == "__main__":
    main()

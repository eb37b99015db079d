"""Fine-tuning CLI.

Mirrors the reference fine-tune recipe (ref: Paligemma_FT.ipynb): LoRA r=8
on q/k/v/o/gate/up/down (cell 41), AdamW lr=1e-4, grad-accum 8, clip 1.0
(cells 43/47), JSON-extraction targets via json2token (cell 20), validation
by generate + normalized edit distance (cell 38).

TPU-native differences: the step is a single jit over a DP(xTP) mesh with
remat (the gradient checkpointing README.md:20 advertises but never ships),
optional int8 base (QLoRA analog), and orbax local checkpoints for resume
(the reference can only push to the HF hub).

Dataset format: a JSONL manifest with rows
``{"image": <path>, "prompt": <str>, "target": <str-or-json>}``.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    from .errors import user_errors

    with user_errors():
        _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser(description="PaliGemma TPU fine-tuning")
    p.add_argument("--model_path", required=True, help="HF checkpoint directory")
    p.add_argument("--train_jsonl", default=None)
    p.add_argument("--eval_jsonl", default=None)
    p.add_argument("--hf_dataset", default=None,
                   help="HF dataset (hub name or local save_to_disk dir) of "
                        "CORD-style rows (image + ground_truth JSON) — the "
                        "reference's naver-clova-ix/cord-v2 path "
                        "(ref: Paligemma_FT.ipynb cell 20)")
    p.add_argument("--hf_train_split", default="train")
    p.add_argument("--hf_eval_split", default=None,
                   help="e.g. 'validation' to also eval from --hf_dataset")
    p.add_argument("--shuffle_seed", type=int, default=0,
                   help="seed for per-epoch training-order shuffling "
                        "(-1 disables shuffling)")
    p.add_argument("--eval_subset", type=int, default=16,
                   help="number of eval rows scored per evaluation "
                        "(0 = all rows)")
    p.add_argument("--prompt", default="extract JSON.")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--resume_from", default=None)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=8)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--warmup_steps", type=int, default=50)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--full_finetune", action="store_true",
                   help="full LM fine-tune (vision frozen) instead of LoRA")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8 base + LoRA (alias for --base_quant int8)")
    p.add_argument("--base_quant", default="none",
                   choices=("none", "int8", "nf4", "int4"),
                   help="quantize the FROZEN LM base for the fine-tune: "
                        "int8 per-channel, or blockwise 4-bit (nf4 = the "
                        "reference's BitsAndBytes QLoRA recipe, ref: "
                        "Paligemma_FT.ipynb cell 41; int4 = symmetric grid)")
    p.add_argument("--max_length", type=int, default=512)
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--fsdp", action="store_true",
                   help="shard params/grads/optimizer state over the data "
                        "axis too (ZeRO-3; for full fine-tunes whose AdamW "
                        "moments exceed one chip)")
    p.add_argument("--eval_every", type=int, default=200)
    p.add_argument("--max_new_tokens_eval", type=int, default=512)
    p.add_argument("--early_stopping_patience", type=int, default=0,
                   help="stop when val_edit_distance hasn't improved for N "
                        "evals (0 = off; ref: FT notebook EarlyStopping cell 45)")
    p.add_argument("--export_hf", action="store_true",
                   help="also export the final (LoRA-merged) model as an "
                        "HF-format checkpoint directory (the offline analog "
                        "of the reference's hub push)")
    p.add_argument("--only_cpu", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host run (jax.distributed auto-init; "
                        "every host launches this same command) and train "
                        "over a DP-over-DCN x TP-over-ICI global mesh")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port for --multihost off-pod "
                        "(TPU pods auto-detect); requires --num_processes "
                        "and --process_id")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args(argv)

    import jax

    if args.multihost:
        from ..core import multihost as mh

        # before anything touches the XLA backend (device queries below)
        mh.initialize(args.coordinator, args.num_processes, args.process_id)
    if args.only_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image
    from transformers import AutoTokenizer

    from ..checkpoints.hf_loader import load_hf_model
    from ..core import mesh as mesh_lib
    from ..processing.processor import PaliGemmaProcessor
    from ..runtime.engine import PaliGemmaEngine
    from ..runtime.quantize import quantize_lm_for_serving
    from ..train.data import collate, json2token, normalized_edit_distance
    from ..train.trainer import TrainConfig, Trainer

    def load_manifest(path):
        rows = []
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                target = row["target"]
                if not isinstance(target, str):
                    target = json2token(target)
                rows.append(
                    {"image": row["image"],
                     "prompt": row.get("prompt", args.prompt),
                     "target": target}
                )
        return rows

    params, config = load_hf_model(args.model_path, jnp.bfloat16)
    if args.quantize_int8 and args.base_quant == "none":
        args.base_quant = "int8"
    if args.base_quant == "int8":
        # fuse=False: the fused qkv/gateup layout is a serving-side
        # transform; training needs per-projection weights so LoRA deltas
        # can be merged back for eval/export
        params = quantize_lm_for_serving(params, fuse=False)
    elif args.base_quant in ("nf4", "int4"):
        from ..runtime.quantize import quantize_lm_for_training

        params = quantize_lm_for_training(
            params, kind=args.base_quant, fuse=False
        )
    tokenizer = AutoTokenizer.from_pretrained(args.model_path, padding_side="right")
    processor = PaliGemmaProcessor(
        tokenizer,
        num_image_tokens=config.vision_config.num_image_tokens,
        image_size=config.vision_config.image_size,
    )

    mesh = None
    if args.multihost:
        from ..core import multihost as mh

        mesh = mh.make_multihost_mesh(
            args.data_parallel if args.data_parallel > 1 else None,
            args.model_parallel if args.model_parallel > 1 else None,
        )
    elif args.data_parallel * args.model_parallel > 1:
        mesh = mesh_lib.make_mesh(args.data_parallel, args.model_parallel)

    tc = TrainConfig(
        learning_rate=args.learning_rate,
        grad_clip=args.grad_clip,
        grad_accum_steps=args.grad_accum,
        warmup_steps=args.warmup_steps,
        lora_rank=None if args.full_finetune else args.lora_rank,
        fsdp=args.fsdp,
    )
    trainer = Trainer(params, config, tc, mesh=mesh)
    if args.resume_from:
        trainer.restore(args.resume_from)

    if not args.train_jsonl and not args.hf_dataset:
        p.error("provide --train_jsonl or --hf_dataset")
    if args.hf_dataset:
        from ..train.hf_dataset import load_hf_rows

        train_rows = list(load_hf_rows(
            args.hf_dataset, split=args.hf_train_split, prompt=args.prompt
        ).rows())
        eval_rows = (
            list(load_hf_rows(args.hf_dataset, split=args.hf_eval_split,
                              prompt=args.prompt).rows())
            if args.hf_eval_split else []
        )
    else:
        train_rows = load_manifest(args.train_jsonl)
        eval_rows = []
    if args.eval_jsonl:
        eval_rows = load_manifest(args.eval_jsonl)

    def _image(r):
        return Image.open(r["image"]) if isinstance(r["image"], str) else r["image"]

    def batches(rows, bs, epoch):
        """Seeded per-epoch shuffle; the tail partial batch is KEPT by
        replicating rows up to ``bs`` with their labels blanked to -100, so
        the padding rows contribute zero gradient and the step keeps one
        compiled shape (the reference's loader shuffles and drops nothing;
        round-1 silently dropped the tail)."""
        order = list(range(len(rows)))
        if args.shuffle_seed >= 0:
            np.random.default_rng(args.shuffle_seed + epoch).shuffle(order)
        for i in range(0, len(order), bs):
            idx = order[i : i + bs]
            n_real = len(idx)
            idx = idx + [idx[0]] * (bs - n_real)  # replicate to full batch
            chunk = [rows[j] for j in idx]
            batch = collate(
                processor, [_image(r) for r in chunk],
                [r["prompt"] for r in chunk],
                [r["target"] for r in chunk],
                max_length=args.max_length,
            )
            if n_real < bs:
                batch["labels"][n_real:] = -100  # padding rows: no gradient
            yield batch

    from ..runtime.logging import MetricsLogger

    step = 0
    os.makedirs(args.output_dir, exist_ok=True)
    metrics = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"))
    best_dist, evals_since_best, stop = float("inf"), 0, False
    for epoch in range(args.epochs):
        if stop:
            break
        for batch in batches(train_rows, args.batch_size, epoch):
            t0 = time.perf_counter()
            loss = trainer.train_step(batch)
            dt = time.perf_counter() - t0
            step += 1
            tokens = int(batch["attention_mask"].sum())
            print(f"epoch {epoch} step {step} loss {loss:.4f} ({dt*1e3:.0f} ms)")
            metrics.log(step, epoch=epoch, train_loss=loss, step_ms=dt * 1e3,
                        tokens_per_sec=tokens / dt)
            if eval_rows and step % args.eval_every == 0:
                dist = _evaluate(trainer, processor, eval_rows, config, args)
                metrics.log(step, val_edit_distance=dist)
                if dist < best_dist - 1e-6:
                    best_dist, evals_since_best = dist, 0
                else:
                    evals_since_best += 1
                if (args.early_stopping_patience
                        and evals_since_best >= args.early_stopping_patience):
                    print(f"early stopping: no val improvement for "
                          f"{evals_since_best} evals")
                    stop = True
                    break
        trainer.save(os.path.join(args.output_dir, f"epoch_{epoch}"))
    trainer.save(os.path.join(args.output_dir, "final"))
    metrics.close()
    if args.export_hf:
        from ..checkpoints.hf_export import export_hf_checkpoint

        export_dir = os.path.join(args.output_dir, "hf_export")
        export_hf_checkpoint(config, trainer.merged_params(), export_dir)
        # ship the tokenizer along so the export is directly servable
        tokenizer.save_pretrained(export_dir)
        print(f"exported HF checkpoint to {export_dir}")
    print("done")


def _evaluate(trainer, processor, eval_rows, config, args):
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..runtime.engine import PaliGemmaEngine
    from ..train.data import normalized_edit_distance

    engine = PaliGemmaEngine(
        trainer.merged_params(), config,
        max_seq_len=args.max_length + args.max_new_tokens_eval,
        eos_token_id=processor.tokenizer.eos_token_id,
    )
    scores = []
    subset = eval_rows[: args.eval_subset] if args.eval_subset else eval_rows
    for row in subset:
        img = Image.open(row["image"]) if isinstance(row["image"], str) else row["image"]
        inputs = processor(images=[img], text=[row["prompt"]])
        toks = engine.generate(
            jnp.asarray(inputs["pixel_values"]),
            jnp.asarray(inputs["input_ids"]),
            jnp.asarray(inputs["attention_mask"]),
            max_new_tokens=args.max_new_tokens_eval, do_sample=False,
        )
        pred = processor.tokenizer.decode(toks[0], skip_special_tokens=True)
        scores.append(normalized_edit_distance(pred, row["target"]))
    dist = float(np.mean(scores))
    print(f"val_edit_distance {dist:.4f}")
    return dist


if __name__ == "__main__":
    main()

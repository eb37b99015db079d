"""End-to-end CLI tests against a fabricated tiny HF checkpoint directory
(config.json + model.safetensors + fast tokenizer), exercising the same path
a user takes with google/paligemma-3b-pt-224."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = 288


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")

    # ---- tiny HF PaliGemma with real safetensors ----
    cfg = transformers.PaliGemmaConfig(
        vision_config=dict(
            image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, projection_dim=48,
            vision_use_head=False,
        ),
        text_config=dict(
            vocab_size=VOCAB, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, model_type="gemma",
            bos_token_id=2, eos_token_id=1, pad_token_id=0,
        ),
        projection_dim=48, image_token_index=280, pad_token_id=0,
        vocab_size=VOCAB,
    )
    torch.manual_seed(0)
    model = transformers.PaliGemmaForConditionalGeneration(cfg).eval()
    model.save_pretrained(str(d), safe_serialization=True)

    # ---- tiny fast tokenizer (word-level) ----
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["this", "building", "is", "a", "answer", "in", "english", "hello",
             "world", "describe", "the", "image", "extract", "json"]
    vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "\n": 3, "<unk>": 4}
    for w in words:
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>", eos_token="<eos>", bos_token="<bos>", unk_token="<unk>",
    )
    fast.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def image_path(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("img") / "pic1.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(p)
    return str(p)


def test_infer_cli_end_to_end(checkpoint_dir, image_path, capsys):
    from paligemma_tpu.cli.infer import main

    main([
        "--model_path", checkpoint_dir,
        "--prompt", "describe the image",
        "--image_file_path", image_path,
        "--max_tokens_to_generate", "5",
        "--dtype", "float32",
    ])
    out = capsys.readouterr().out
    assert "describe the image" in out
    assert "Running inference" in out


def test_infer_cli_batch_and_sampling(checkpoint_dir, image_path, capsys):
    from paligemma_tpu.cli.infer import main

    main([
        "--model_path", checkpoint_dir,
        "--prompt", "hello world",
        "--prompt", "this building is",
        "--image_file_path", image_path,
        "--image_file_path", image_path,
        "--max_tokens_to_generate", "4",
        "--do_sample", "--temperature", "0.7", "--top_p", "0.9",
        "--dtype", "float32",
    ])
    out = capsys.readouterr().out
    assert "hello world" in out and "this building is" in out


def test_finetune_cli_end_to_end(checkpoint_dir, image_path, tmp_path, capsys):
    from paligemma_tpu.cli.finetune import main

    manifest = tmp_path / "train.jsonl"
    rows = [
        {"image": image_path, "prompt": "extract json",
         "target": {"total": "10"}},
        {"image": image_path, "prompt": "extract json",
         "target": {"total": "12"}},
    ]
    manifest.write_text("\n".join(json.dumps(r) for r in rows))

    main([
        "--model_path", checkpoint_dir,
        "--train_jsonl", str(manifest),
        "--output_dir", str(tmp_path / "out"),
        "--batch_size", "2",
        "--grad_accum", "1",
        "--epochs", "2",
        "--lora_rank", "2",
        "--warmup_steps", "0",
        "--max_length", "64",
    ])
    out = capsys.readouterr().out
    assert "loss" in out and "done" in out
    assert os.path.exists(tmp_path / "out" / "final")


def test_infer_cli_int8(checkpoint_dir, image_path, capsys):
    from paligemma_tpu.cli.infer import main

    main([
        "--model_path", checkpoint_dir,
        "--prompt", "describe the image",
        "--image_file_path", image_path,
        "--max_tokens_to_generate", "3",
        "--dtype", "float32",
        "--quantize_int8",
    ])
    out = capsys.readouterr().out
    assert "describe the image" in out


def test_finetune_cli_export_hf(checkpoint_dir, image_path, tmp_path):
    from paligemma_tpu.cli.finetune import main

    manifest = tmp_path / "train.jsonl"
    manifest.write_text(json.dumps(
        {"image": image_path, "prompt": "extract json", "target": {"a": "1"}}
    ) + "\n" + json.dumps(
        {"image": image_path, "prompt": "extract json", "target": {"a": "2"}}
    ))
    main([
        "--model_path", checkpoint_dir,
        "--train_jsonl", str(manifest),
        "--output_dir", str(tmp_path / "out"),
        "--batch_size", "2", "--grad_accum", "1", "--epochs", "1",
        "--lora_rank", "2", "--warmup_steps", "0", "--max_length", "64",
        "--export_hf",
    ])
    exp = tmp_path / "out" / "hf_export"
    assert (exp / "model.safetensors").exists()
    assert (exp / "config.json").exists()
    # the exported dir loads back into the framework
    import jax.numpy as jnp

    from paligemma_tpu.checkpoints.hf_loader import load_hf_model

    params, cfg = load_hf_model(str(exp), jnp.float32)
    assert params["lm"]["embed"].shape[0] == VOCAB


def test_finetune_writes_metrics_jsonl(checkpoint_dir, image_path, tmp_path):
    from paligemma_tpu.cli.finetune import main

    manifest = tmp_path / "t.jsonl"
    manifest.write_text(json.dumps(
        {"image": image_path, "prompt": "x", "target": {"a": "1"}}
    ) + "\n" + json.dumps(
        {"image": image_path, "prompt": "x", "target": {"a": "2"}}
    ))
    out = tmp_path / "out"
    main(["--model_path", checkpoint_dir, "--train_jsonl", str(manifest),
          "--output_dir", str(out), "--batch_size", "2", "--grad_accum", "1",
          "--epochs", "1", "--lora_rank", "2", "--warmup_steps", "0",
          "--max_length", "64"])
    lines = (out / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(lines[0])
    assert "train_loss" in rec and "tokens_per_sec" in rec and rec["step"] == 1


def test_finetune_early_stopping(checkpoint_dir, image_path, tmp_path, capsys):
    from paligemma_tpu.cli.finetune import main

    manifest = tmp_path / "t.jsonl"
    manifest.write_text("\n".join(json.dumps(
        {"image": image_path, "prompt": "x", "target": {"a": str(i)}}
    ) for i in range(2)))
    main(["--model_path", checkpoint_dir, "--train_jsonl", str(manifest),
          "--eval_jsonl", str(manifest), "--eval_every", "1",
          "--early_stopping_patience", "1", "--max_new_tokens_eval", "4",
          "--output_dir", str(tmp_path / "out"), "--batch_size", "2",
          "--grad_accum", "1", "--epochs", "50", "--lora_rank", "2",
          "--warmup_steps", "0", "--max_length", "64"])
    out = capsys.readouterr().out
    assert "early stopping" in out
    # stopped long before 50 epochs
    assert out.count("epoch 49") == 0


def test_finetune_qlora_int8_with_eval(checkpoint_dir, image_path, tmp_path, capsys):
    """int8-base LoRA fine-tune with eval (exercises merge over quantized base)."""
    from paligemma_tpu.cli.finetune import main

    manifest = tmp_path / "t.jsonl"
    manifest.write_text("\n".join(json.dumps(
        {"image": image_path, "prompt": "x", "target": {"a": str(i)}}
    ) for i in range(2)))
    main(["--model_path", checkpoint_dir, "--train_jsonl", str(manifest),
          "--eval_jsonl", str(manifest), "--eval_every", "1",
          "--max_new_tokens_eval", "3",
          "--output_dir", str(tmp_path / "out"), "--batch_size", "2",
          "--grad_accum", "1", "--epochs", "1", "--lora_rank", "2",
          "--warmup_steps", "0", "--max_length", "64", "--quantize_int8"])
    out = capsys.readouterr().out
    assert "val_edit_distance" in out and "done" in out


@pytest.fixture(scope="module")
def hf_dataset_dir(tmp_path_factory, image_path):
    """Tiny CORD-shaped HF dataset (image + ground_truth JSON), saved to
    disk — the offline stand-in for naver-clova-ix/cord-v2
    (ref: Paligemma_FT.ipynb cell 20)."""
    datasets = pytest.importorskip("datasets")
    from PIL import Image as PILImage

    img = PILImage.open(image_path)
    rows = {
        "image": [img] * 4,
        "ground_truth": [
            json.dumps({"gt_parse": {"total": str(10 + i), "menu": [
                {"nm": "building", "price": str(i)}]}})
            for i in range(4)
        ],
    }
    ds = datasets.Dataset.from_dict(rows).cast_column(
        "image", datasets.Image()
    )
    d = tmp_path_factory.mktemp("hfds")
    ds.save_to_disk(str(d / "cord_tiny"))
    return str(d / "cord_tiny")


def test_finetune_cli_hf_dataset(checkpoint_dir, hf_dataset_dir, tmp_path, capsys):
    """Fine-tune straight off an HF dataset directory — the reference's
    CORD-v2 path (CustomDataset + json2token, FT notebook cell 20)."""
    from paligemma_tpu.cli.finetune import main

    main([
        "--model_path", checkpoint_dir,
        "--hf_dataset", hf_dataset_dir,
        "--output_dir", str(tmp_path / "out"),
        "--batch_size", "2", "--grad_accum", "1", "--epochs", "1",
        "--lora_rank", "2", "--warmup_steps", "0", "--max_length", "64",
    ])
    out = capsys.readouterr().out
    assert "loss" in out and "done" in out
    assert os.path.exists(tmp_path / "out" / "final")


def test_finetune_shuffling_and_tail_batch(checkpoint_dir, image_path, tmp_path):
    """3 rows at batch_size=2: the tail batch is kept (2 steps/epoch), the
    epoch order is seed-deterministic, and different seeds give different
    step-level losses while the same seed reproduces them exactly."""
    from paligemma_tpu.cli.finetune import main

    manifest = tmp_path / "train.jsonl"
    # distinct in-vocab target words — rows must differ once tokenized, or
    # the order comparison below is vacuous
    words = ["hello", "world", "building"]
    rows = [
        {"image": image_path, "prompt": "extract json",
         "target": {"total": w}}
        for w in words
    ]
    manifest.write_text("\n".join(json.dumps(r) for r in rows))

    def run(tag, seed):
        out = tmp_path / f"out_{tag}"
        main([
            "--model_path", checkpoint_dir,
            "--train_jsonl", str(manifest),
            "--output_dir", str(out),
            "--batch_size", "2", "--grad_accum", "1", "--epochs", "1",
            "--lora_rank", "2", "--warmup_steps", "0", "--max_length", "64",
            "--shuffle_seed", str(seed),
        ])
        with open(out / "metrics.jsonl") as f:
            return [json.loads(l)["train_loss"] for l in f if "train_loss" in l]

    a = run("a", 0)
    b = run("b", 0)
    c = run("c", 123)
    assert len(a) == 2  # ceil(3/2): tail batch kept, not dropped
    assert a == b  # same seed -> identical order -> identical losses
    assert a != c  # different seed -> different order


def test_infer_cli_friendly_errors(checkpoint_dir, image_path, capsys):
    """User mistakes exit 2 with a one-line message, not a traceback
    (ROADMAP 'CLI error paths' item)."""
    from paligemma_tpu.cli.infer import main

    # mismatched prompt/image counts
    with pytest.raises(SystemExit) as ei:
        main([
            "--model_path", checkpoint_dir,
            "--prompt", "a", "--prompt", "b",
            "--image_file_path", image_path,
            "--only_cpu",
        ])
    assert ei.value.code == 2
    assert "one image per prompt" in capsys.readouterr().err

    # missing image file
    with pytest.raises(SystemExit) as ei:
        main([
            "--model_path", checkpoint_dir,
            "--prompt", "a",
            "--image_file_path", "/nonexistent/pic.png",
            "--only_cpu",
        ])
    assert ei.value.code == 2
    assert "file not found" in capsys.readouterr().err


def test_finetune_cli_friendly_errors(checkpoint_dir, tmp_path, capsys):
    from paligemma_tpu.cli.finetune import main

    with pytest.raises(SystemExit) as ei:
        main([
            "--model_path", checkpoint_dir,
            "--train_jsonl", "/nonexistent/train.jsonl",
            "--output_dir", str(tmp_path / "out"),
            "--only_cpu",
        ])
    assert ei.value.code == 2
    assert "not found" in capsys.readouterr().err


def test_serve_cli_batch_jsonl(checkpoint_dir, image_path, tmp_path, capsys):
    """Batch mode: 3 requests (one sampled) through the dense engine,
    one JSON result line per request."""
    from paligemma_tpu.cli.serve import main

    reqs = tmp_path / "reqs.jsonl"
    rows = [
        {"request_id": 7, "prompt": "describe the image",
         "image": image_path, "max_new_tokens": 4},
        {"prompt": "hello world", "image": image_path,
         "max_new_tokens": 3, "do_sample": True, "temperature": 0.7},
        {"prompt": "this building is", "image": image_path,
         "max_new_tokens": 5},
    ]
    reqs.write_text("\n".join(json.dumps(r) for r in rows))

    main([
        "--model_path", checkpoint_dir,
        "--requests_jsonl", str(reqs),
        "--max_slots", "2",
        "--max_seq_len", "64",
        "--dtype", "float32",
    ])
    out_lines = [json.loads(ln) for ln in
                 capsys.readouterr().out.strip().splitlines()]
    assert len(out_lines) == 3
    by_id = {r["request_id"]: r for r in out_lines}
    assert set(by_id) == {7, 8, 9}  # explicit id respected, rest follow on
    assert by_id[7]["num_tokens"] == 4
    assert by_id[9]["num_tokens"] == 5
    assert all(isinstance(r["text"], str) for r in out_lines)


def test_serve_cli_paged_engine(checkpoint_dir, image_path, tmp_path, capsys):
    """--engine paged takes the paged-KV pool (2 slots, page 16) through
    the same CLI contract."""
    from paligemma_tpu.cli.serve import main

    reqs = tmp_path / "reqs.jsonl"
    rows = [
        {"prompt": "extract json", "image": image_path, "max_new_tokens": 3}
        for _ in range(3)
    ]
    reqs.write_text("\n".join(json.dumps(r) for r in rows))

    main([
        "--model_path", checkpoint_dir,
        "--engine", "paged",
        "--requests_jsonl", str(reqs),
        "--max_slots", "2",
        "--max_seq_len", "64",
        "--page_size", "16",
        "--dtype", "float32",
    ])
    out_lines = [json.loads(ln) for ln in
                 capsys.readouterr().out.strip().splitlines()]
    assert len(out_lines) == 3
    assert all(r["num_tokens"] == 3 for r in out_lines)


def test_serve_cli_http(checkpoint_dir, image_path):
    """HTTP mode in-process: POST /generate (path + base64 image forms)
    and GET /healthz against an ephemeral port."""
    import base64
    import threading
    import urllib.request

    from paligemma_tpu.cli.serve import _build_parser, build_server

    args = _build_parser().parse_args([
        "--model_path", checkpoint_dir,
        "--http", "0",
        "--max_slots", "2",
        "--max_seq_len", "64",
        "--dtype", "float32",
    ])
    srv = build_server(args)
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_http,
        args=(0,), kwargs={"ready_event": ready, "max_requests": 2},
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=120)
    base = f"http://127.0.0.1:{srv.http_port}"

    def post(obj):
        data = json.dumps(obj).encode()
        req = urllib.request.Request(
            base + "/generate", data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            return json.loads(resp.read())

    r1 = post({"prompt": "describe the image", "image": image_path,
               "max_new_tokens": 3})
    assert r1["num_tokens"] == 3 and isinstance(r1["text"], str)

    with open(image_path, "rb") as fh:
        b64 = base64.b64encode(fh.read()).decode()
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["served"] == 1

    r2 = post({"prompt": "hello world", "image_b64": b64,
               "max_new_tokens": 2})
    assert r2["num_tokens"] == 2
    t.join(timeout=60)
    assert not t.is_alive()  # max_requests=2 shut the server down


def test_serve_cli_http_stream(checkpoint_dir, image_path):
    """SSE streaming: one data event per accepted token, then a done
    event whose text equals the joined stream."""
    import threading
    import urllib.request

    from paligemma_tpu.cli.serve import _build_parser, build_server

    args = _build_parser().parse_args([
        "--model_path", checkpoint_dir,
        "--http", "0",
        "--max_slots", "2",
        "--max_seq_len", "64",
        "--sync_every", "2",
        "--dtype", "float32",
    ])
    srv = build_server(args)
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_http,
        args=(0,), kwargs={"ready_event": ready, "max_requests": 1},
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=120)

    data = json.dumps({"prompt": "describe the image", "image": image_path,
                       "max_new_tokens": 5, "stream": True}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.http_port}/generate", data=data,
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        for line in resp:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    assert events[-1].get("done") and events[-1]["num_tokens"] == 5
    tok_events = [e for e in events if "token" in e]
    assert len(tok_events) == 5
    t.join(timeout=60)
    assert not t.is_alive()


def test_serve_cli_friendly_errors(checkpoint_dir, tmp_path, capsys):
    from paligemma_tpu.cli.serve import main

    # neither batch nor http mode selected
    with pytest.raises(SystemExit) as ei:
        main(["--model_path", checkpoint_dir, "--only_cpu"])
    assert ei.value.code == 2
    assert "--requests_jsonl" in capsys.readouterr().err

    # DENSE engine shards weights only (pure TP) — a data axis is invalid
    # there (the PAGED engine accepts one: slots + pool shard over "data")
    with pytest.raises(SystemExit) as ei:
        main([
            "--model_path", checkpoint_dir,
            "--engine", "dense",
            "--requests_jsonl", "-",
            "--data_parallel", "2",
            "--only_cpu",
        ])
    assert ei.value.code == 2
    assert "pure TP" in capsys.readouterr().err

    # paged DP: slot count must divide over the data shards
    with pytest.raises(SystemExit) as ei:
        main([
            "--model_path", checkpoint_dir,
            "--engine", "paged",
            "--requests_jsonl", "-",
            "--data_parallel", "2",
            "--max_slots", "3",
            "--only_cpu",
        ])
    assert ei.value.code == 2
    assert "divide" in capsys.readouterr().err

    # malformed request JSON
    bad = tmp_path / "bad.jsonl"
    bad.write_text("{not json}\n")
    with pytest.raises(SystemExit) as ei:
        main([
            "--model_path", checkpoint_dir,
            "--requests_jsonl", str(bad),
            "--only_cpu",
        ])
    assert ei.value.code == 2
    assert "bad JSON" in capsys.readouterr().err


def test_serve_cli_http_cancel(checkpoint_dir, image_path):
    """POST /cancel unblocks a waiting /generate handler with
    {"cancelled": true} and frees the slot for later requests."""
    import threading
    import time
    import urllib.request

    from paligemma_tpu.cli.serve import _build_parser, build_server

    args = _build_parser().parse_args([
        "--model_path", checkpoint_dir,
        "--http", "0",
        "--max_slots", "1",
        "--max_seq_len", "128",
        "--sync_every", "2",
        "--dtype", "float32",
    ])
    srv = build_server(args)
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve_http,
        args=(0,), kwargs={"ready_event": ready, "max_requests": 1},
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=120)
    base = f"http://127.0.0.1:{srv.http_port}"

    def post(path, obj, out=None):
        data = json.dumps(obj).encode()
        req = urllib.request.Request(
            base + path, data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            r = json.loads(resp.read())
        if out is not None:
            out.append(r)
        return r

    victim_result = []
    a = threading.Thread(
        target=post,
        args=("/generate",
              {"request_id": 7, "prompt": "describe the image",
               "image": image_path, "max_new_tokens": 60},
              victim_result),
        daemon=True,
    )
    a.start()
    # /cancel serializes on the engine lock behind the in-flight window,
    # so this lands mid-generation (60 tokens x 2-tick windows)
    time.sleep(1.0)
    c = post("/cancel", {"request_id": 7})
    assert c["cancelled"] is True
    a.join(timeout=300)
    assert victim_result and victim_result[0]["cancelled"] is True

    r = post("/generate", {"prompt": "hello world", "image": image_path,
                           "max_new_tokens": 2})
    assert r["num_tokens"] == 2
    t.join(timeout=60)
    assert not t.is_alive()

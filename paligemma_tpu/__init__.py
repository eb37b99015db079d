"""paligemma_tpu — TPU-native PaliGemma vision-language framework.

JAX/XLA/Pallas rebuild of the capabilities of
prtk1729/Paligemma-MultiModal-System (see PARITY.md for the line-by-line
map). Quick start:

    import jax.numpy as jnp
    from paligemma_tpu import load_hf_model, PaliGemmaEngine

    params, cfg = load_hf_model("/path/to/paligemma-3b-pt-224", jnp.bfloat16)
    engine = PaliGemmaEngine(params, cfg, max_seq_len=1024)
    tokens = engine.generate(pixel_values, input_ids, attention_mask)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports keep `import paligemma_tpu` dependency-light
    if name == "load_hf_model":
        from .checkpoints.hf_loader import load_hf_model

        return load_hf_model
    if name == "PaliGemmaEngine":
        from .runtime.engine import PaliGemmaEngine

        return PaliGemmaEngine
    if name == "ServingEngine":
        from .runtime.serving import ServingEngine

        return ServingEngine
    if name == "PagedServingEngine":
        from .runtime.serving_paged import PagedServingEngine

        return PagedServingEngine
    if name == "Request":
        from .runtime.serving import Request

        return Request
    if name == "PaliGemmaProcessor":
        from .processing.processor import PaliGemmaProcessor

        return PaliGemmaProcessor
    if name == "PaliGemmaConfig":
        from .core.config import PaliGemmaConfig

        return PaliGemmaConfig
    if name == "Trainer":
        from .train.trainer import Trainer

        return Trainer
    if name == "extract_objects":
        from .processing.detection import extract_objects

        return extract_objects
    if name == "Detection":
        from .processing.detection import Detection

        return Detection
    raise AttributeError(name)

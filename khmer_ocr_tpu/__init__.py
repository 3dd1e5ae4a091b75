"""khmer_ocr_tpu — TPU-native (JAX/XLA/Pallas/pjit) Khmer OCR framework.

A from-scratch re-design of netra-ai-lab/Khmer-OCR-CNN-Transformer for TPU:
chunk-and-merge CNN+Transformer text-line recognition (SE-VGG / VGG / ResNet
backbones), layout detection, document pipelines, synthetic-data generation,
training, and mesh-parallel batched inference.
"""

__version__ = "0.1.0"

from .config import DecodeConfig, ModelConfig, OCRConfig, PreprocessConfig, RuntimeConfig, TrainConfig
from .metrics import Evaluator, calculate_cer, levenshtein
from .tokenizer import Tokenizer


def recognize(image_input, beam_width: int = 3, model_path=None, vocab_path=None) -> str:
    """Recognize text from one image (reference API: recognize_text.py:69-90)."""
    from .infer.api import recognize as _recognize

    return _recognize(image_input, beam_width=beam_width, model_path=model_path, vocab_path=vocab_path)


def recognize_batch(image_list, beam_width: int = 1, batch_size: int = 8, model_path=None, vocab_path=None):
    """Recognize a list of images with batched TPU decoding
    (reference API: recognize_text.py:92-102)."""
    from .infer.api import recognize_batch as _recognize_batch

    return _recognize_batch(
        image_list, beam_width=beam_width, batch_size=batch_size, model_path=model_path, vocab_path=vocab_path
    )


def __getattr__(name):
    """Lazy heavyweight exports (these pull in JAX)."""
    if name == "Predictor":
        from .infer.predictor import Predictor

        return Predictor
    if name == "KhmerOCRInference":
        from .infer.standalone import KhmerOCRInference

        return KhmerOCRInference
    if name == "KhmerOCRPipeline":
        from .pipeline.engine import KhmerOCRPipeline

        return KhmerOCRPipeline
    raise AttributeError(f"module 'khmer_ocr_tpu' has no attribute {name!r}")


__all__ = [
    "DecodeConfig",
    "Evaluator",
    "KhmerOCRInference",
    "KhmerOCRPipeline",
    "ModelConfig",
    "OCRConfig",
    "Predictor",
    "PreprocessConfig",
    "RuntimeConfig",
    "Tokenizer",
    "TrainConfig",
    "calculate_cer",
    "levenshtein",
    "recognize",
    "recognize_batch",
]

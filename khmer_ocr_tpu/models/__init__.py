from .ocr_model import (
    CHUNK_TOKENS,
    decode_step,
    decode_train,
    encode,
    forward_train,
    init_decode_state,
    init_model,
)

__all__ = [
    "CHUNK_TOKENS",
    "decode_step",
    "decode_train",
    "encode",
    "forward_train",
    "init_decode_state",
    "init_model",
]

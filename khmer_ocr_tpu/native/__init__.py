from .build import load_native_library, levenshtein_batch

__all__ = ["load_native_library", "levenshtein_batch"]

from .engine import KhmerOCRPipeline

__all__ = ["KhmerOCRPipeline"]

from .config import LayoutConfig

__all__ = ["LayoutConfig"]

from .generator import DocumentTextGenerator, SceneTextGenerator, render_text_line

__all__ = ["DocumentTextGenerator", "SceneTextGenerator", "render_text_line"]

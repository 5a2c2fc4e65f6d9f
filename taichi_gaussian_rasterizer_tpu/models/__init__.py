from . import renderer2d

__all__ = ["renderer2d"]

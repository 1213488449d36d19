from .config import InterestConfig

__all__ = ["InterestConfig"]

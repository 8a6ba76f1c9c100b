from .bits import trailing_zeros

__all__ = ["trailing_zeros"]

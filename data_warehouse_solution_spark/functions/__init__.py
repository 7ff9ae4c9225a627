from .exactmath import dec, dsum, one_minus, one_plus

__all__ = ["dec", "dsum", "one_minus", "one_plus"]

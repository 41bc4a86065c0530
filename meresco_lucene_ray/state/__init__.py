from .numerate import TermNumerator, numerate_columns

__all__ = ["TermNumerator", "numerate_columns"]

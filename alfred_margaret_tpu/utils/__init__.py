from .case import CASE_SENSITIVE, IGNORE_CASE, CaseSensitivity

__all__ = ["CaseSensitivity", "CASE_SENSITIVE", "IGNORE_CASE"]

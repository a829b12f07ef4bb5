from . import ac, case_dfa

__all__ = ["ac", "case_dfa"]

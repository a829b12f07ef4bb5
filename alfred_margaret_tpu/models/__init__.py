from . import ac, case_dfa, nfa_oracle

__all__ = ["ac", "case_dfa", "nfa_oracle"]

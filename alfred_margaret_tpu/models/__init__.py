from . import ac

__all__ = ["ac"]

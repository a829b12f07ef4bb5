from . import xla_scan

__all__ = ["xla_scan"]

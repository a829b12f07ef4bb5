from .build import NativeUnavailable, load

__all__ = ["load", "NativeUnavailable"]

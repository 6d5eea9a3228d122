"""Native (C++) host-side components, compiled on demand via g++ + ctypes."""

from .build import load_library, native_available

__all__ = ["load_library", "native_available"]

"""Native (C++) runtime components, loaded via ctypes with graceful
fallback when the toolchain is unavailable."""

from .loader import fast_load_safetensors, native_available

__all__ = ["fast_load_safetensors", "native_available"]

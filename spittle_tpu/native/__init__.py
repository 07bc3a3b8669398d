from .ringbuffer import NativeRingBuffer, RingBufferSource, load_native, native_available

__all__ = [
    "NativeRingBuffer",
    "RingBufferSource",
    "load_native",
    "native_available",
]

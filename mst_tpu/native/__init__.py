from mst_tpu.native.bindings import native_available, wav_decode_native

__all__ = ["native_available", "wav_decode_native"]

from mafed_tpu.native.engine import NativeImageEngine, get_engine, native_available

__all__ = ["NativeImageEngine", "get_engine", "native_available"]

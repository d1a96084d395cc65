from tsprofiler_spark.codec.gorilla import gorilla_decode, gorilla_encode
from tsprofiler_spark.codec.dod import dod_decode, dod_encode

__all__ = ["gorilla_encode", "gorilla_decode", "dod_encode", "dod_decode"]

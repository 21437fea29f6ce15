from easyav1_tpu.io.stream import Stream, FileStream, MemoryStream, CustomStream  # noqa: F401

from easyav1_tpu.audio.vorbis.decoder import VorbisDecoder  # noqa: F401

from easyav1_tpu.container.webm import WebMDemuxer, TrackInfo, Packet, TrackType  # noqa: F401

"""Settings, status and enum types mirroring the reference public contract.

Behavioral contract: /root/reference/src/easyav1.h:97-112 (status),
:182-282 (colorimetry enums), :331-335 (log levels), :412-428 (settings),
:430-448 (defaults). Values match the reference exactly so that the C ABI
shim (include/easyav1.h) can pass enums through unchanged.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional


class EasyAV1Status(enum.IntEnum):
    """Decoder status (easyav1.h:97-112). Error detail codes are <= -1."""

    ERROR = 0
    OK = 1
    FINISHED = 2

    INVALID_ARGUMENT = -1
    OUT_OF_MEMORY = -2
    IO_ERROR = -3
    DECODER_ERROR = -4
    NOT_IMPLEMENTED = -5
    INVALID_STATE = -6
    INVALID_DATA = -7
    UNSUPPORTED = -8

    @property
    def is_error(self) -> bool:
        # Mirrors EASYAV1_STATUS_IS_ERROR (easyav1.c:49): anything <= 0.
        return self.value <= 0


class LogLevel(enum.IntEnum):
    """easyav1.h:331-335 — default WARNING (easyav1.c:322)."""

    ERROR = 0
    WARNING = 1
    INFO = 2


class PixelLayout(enum.IntEnum):
    UNKNOWN = 0
    YUV400 = 1
    YUV420 = 2
    YUV422 = 3
    YUV444 = 4


class ColorSpace(enum.IntEnum):
    UNKNOWN = 0
    LIMITED = 1
    FULL = 2


class BitsPerColor(enum.IntEnum):
    UNKNOWN = 0
    BITS_8 = 1
    BITS_10 = 2
    BITS_12 = 3


class ColorPrimaries(enum.IntEnum):
    UNSPECIFIED = 0
    BT709 = 1
    UNKNOWN = 2
    BT470M = 3
    BT470BG = 4
    BT601 = 5
    SMPTE240 = 6
    FILM = 7
    BT2020 = 8
    XYZ = 9
    SMPTE431 = 10
    SMPTE432 = 11
    EBU3213 = 12


class TransferCharacteristics(enum.IntEnum):
    UNSPECIFIED = 0
    BT709 = 1
    UNKNOWN = 2
    BT470M = 3
    BT470BG = 4
    BT601 = 5
    SMPTE240 = 6
    LINEAR = 7
    LOG_100 = 8
    LOG_100_SQRT = 9
    IEC61966 = 10
    BT1361 = 11
    SRGB = 12
    BT2020_10 = 13
    BT2020_12 = 14
    SMPTE2084 = 15
    SMPTE428 = 16
    HLG = 17


class MatrixCoefficients(enum.IntEnum):
    UNSPECIFIED = 0
    IDENTITY = 1
    BT709 = 2
    UNKNOWN = 3
    FCC = 4
    BT470BG = 5
    BT601 = 6
    SMPTE240 = 7
    SMPTE_YCGCO = 8
    BT2020_NCL = 9
    BT2020_CL = 10
    SMPTE2085 = 11
    CHROMATICITY_NCL = 12
    CHROMATICITY_CL = 13
    ICTCP = 14


class ChromaSamplePosition(enum.IntEnum):
    UNKNOWN = 0
    VERTICAL = 1
    COLOCATED = 2


@dataclasses.dataclass
class EasyAV1Settings:
    """Mirror of easyav1_settings (easyav1.h:412-428); defaults per :430-448."""

    enable_video: bool = True
    enable_audio: bool = True
    skip_unprocessed_frames: bool = True
    interlace_audio: bool = True
    close_handle_on_destroy: bool = False
    video_callback: Optional[Callable] = None
    audio_callback: Optional[Callable] = None
    callback_userdata: object = None
    video_track: int = 0
    audio_track: int = 0
    use_fast_seeking: bool = False
    audio_offset_time: int = 0  # milliseconds, signed
    log_level: LogLevel = LogLevel.WARNING
    # tile-parallel entropy decode workers; 0 = auto (cpu count),
    # the dav1d auto-thread analog (reference easyav1.c:1401-1408)
    video_threads: int = 0

    def copy(self) -> "EasyAV1Settings":
        return dataclasses.replace(self)


def default_settings() -> EasyAV1Settings:
    """easyav1_default_settings (easyav1.c:307-323)."""
    return EasyAV1Settings()

"""Self-process perf_event_open counters via ctypes (no perf tool).

Counts hardware events around a callable: cycles, instructions,
dTLB-read-misses, LLC-misses.  Works with perf_event_paranoid <= 2
(own-process, own-cpu counting).
"""

import ctypes
import os
import struct

PERF_TYPE_HARDWARE = 0
PERF_TYPE_HW_CACHE = 3
PERF_COUNT_HW_CPU_CYCLES = 0
PERF_COUNT_HW_INSTRUCTIONS = 1
PERF_COUNT_HW_CACHE_MISSES = 5
# hw_cache encoding: id | (op << 8) | (result << 16)
HW_CACHE_DTLB = 3
HW_CACHE_LL = 2
OP_READ = 0
RESULT_MISS = 1

_libc = ctypes.CDLL(None, use_errno=True)


class _Attr(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_uint32), ("size", ctypes.c_uint32),
        ("config", ctypes.c_uint64), ("sample", ctypes.c_uint64),
        ("sample_type", ctypes.c_uint64), ("read_format", ctypes.c_uint64),
        ("flags", ctypes.c_uint64), ("wakeup", ctypes.c_uint32),
        ("bp_type", ctypes.c_uint32), ("config1", ctypes.c_uint64),
        ("config2", ctypes.c_uint64), ("branch_sample_type", ctypes.c_uint64),
        ("sample_regs_user", ctypes.c_uint64),
        ("sample_stack_user", ctypes.c_uint32), ("clockid", ctypes.c_int32),
        ("sample_regs_intr", ctypes.c_uint64),
        ("aux_watermark", ctypes.c_uint32), ("sample_max_stack", ctypes.c_uint16),
        ("reserved2", ctypes.c_uint16), ("aux_sample_size", ctypes.c_uint32),
        ("reserved3", ctypes.c_uint32), ("sig_data", ctypes.c_uint64),
        ("config3", ctypes.c_uint64),
    ]


def _open(typ, config):
    attr = _Attr()
    attr.type = typ
    attr.size = ctypes.sizeof(_Attr)
    attr.config = config
    attr.flags = 1  # disabled=1
    fd = _libc.syscall(298, ctypes.byref(attr), 0, -1, -1, 0)  # x86_64
    return fd if fd >= 0 else None


EVENTS = [
    ("cycles", PERF_TYPE_HARDWARE, PERF_COUNT_HW_CPU_CYCLES),
    ("instructions", PERF_TYPE_HARDWARE, PERF_COUNT_HW_INSTRUCTIONS),
    ("llc_miss", PERF_TYPE_HARDWARE, PERF_COUNT_HW_CACHE_MISSES),
    ("dtlb_rd_miss", PERF_TYPE_HW_CACHE,
     HW_CACHE_DTLB | (OP_READ << 8) | (RESULT_MISS << 16)),
]

PERF_IOC_RESET = 0x2403
PERF_IOC_ENABLE = 0x2400
PERF_IOC_DISABLE = 0x2401


class Counters:
    def __init__(self):
        self.fds = {}
        for name, typ, cfg in EVENTS:
            fd = _open(typ, cfg)
            if fd is not None:
                self.fds[name] = fd

    def measure(self, fn):
        for fd in self.fds.values():
            _libc.ioctl(fd, PERF_IOC_RESET, 0)
            _libc.ioctl(fd, PERF_IOC_ENABLE, 0)
        out = fn()
        res = {}
        for name, fd in self.fds.items():
            _libc.ioctl(fd, PERF_IOC_DISABLE, 0)
            buf = os.read(fd, 8)
            res[name] = struct.unpack("<Q", buf)[0]
        return out, res

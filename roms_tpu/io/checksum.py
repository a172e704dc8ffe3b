"""Field checksums for I/O integrity (ROMS/Utility/get_hash.F:18-117).

The reference computes a checksum of every field written/read when
CHECKSUM is defined (hooked in nf_fwrite*/nf_fread*) and stores it as a
variable attribute.  Supported algorithms mirror the reference's:
bitsum (default, a 32-bit rotating bit sum), adler32 and crc32.
"""

from __future__ import annotations

import zlib

import numpy as np

_MASK32 = 0xFFFFFFFF


def bitsum(a) -> int:
    """32-bit rotating bit sum of the field's raw bits
    (get_hash.F bit_sum branch): accumulate the IEEE bit patterns into
    a 32-bit integer with end-around carry."""
    raw = np.ascontiguousarray(np.asarray(a, np.float32)).view(np.uint32)
    total = int(np.sum(raw, dtype=np.uint64))
    # fold carries back in (end-around, like a ones'-complement sum)
    while total >> 32:
        total = (total & _MASK32) + (total >> 32)
    return int(total)


def adler32(a) -> int:
    raw = np.ascontiguousarray(np.asarray(a, np.float32)).tobytes()
    return zlib.adler32(raw) & _MASK32


def crc32(a) -> int:
    raw = np.ascontiguousarray(np.asarray(a, np.float32)).tobytes()
    return zlib.crc32(raw) & _MASK32


_ALGORITHMS = {"bitsum": bitsum, "adler32": adler32, "crc32": crc32}


def get_hash(a, algorithm: str = "bitsum") -> int:
    """Checksum a field (get_hash.F dispatch)."""
    try:
        fn = _ALGORITHMS[algorithm]
    except KeyError:
        from ..core.errors import ExitFlag, RomsError
        raise RomsError(ExitFlag.ILLEGAL_INPUT,
                        f"unknown checksum algorithm '{algorithm}'")
    return fn(a)


def verify_hash(a, expected: int, algorithm: str = "bitsum",
                name: str = "field") -> None:
    """Raise RomsError(IO_ERROR) if the field's checksum mismatches —
    the read-side guard of nf_fread* CHECKSUM handling."""
    got = get_hash(a, algorithm)
    if got != int(expected):
        from ..core.errors import ExitFlag, RomsError
        raise RomsError(ExitFlag.IO_ERROR,
                        f"checksum mismatch for {name}: "
                        f"got {got}, expected {int(expected)}")
